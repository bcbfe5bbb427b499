"""Parallel execution: replica farms over device meshes, spatial sharding.

The reference has no distributed runtime (SURVEY.md §2.4) — its parallelism
is rayon threads + one CUDA stream. The TPU-native equivalents here:
  - replicas.py: embarrassingly-parallel simulation farms (lambda windows,
    screening batches) vmapped and sharded over a jax.sharding.Mesh
  - (spatial domain decomposition via shard_map is the roadmap item for
    beyond-one-chip single simulations)
"""
from .replicas import ReplicaFarm  # noqa: F401
