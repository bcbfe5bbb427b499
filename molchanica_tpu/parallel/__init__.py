"""Parallel execution: replica farms over device meshes, spatial sharding.

The reference has no distributed runtime (SURVEY.md §2.4) — its parallelism
is rayon threads + one CUDA stream. The TPU-native equivalents here:
  - replicas.py: embarrassingly-parallel simulation farms (lambda windows,
    screening batches) vmapped and sharded over a jax.sharding.Mesh
  - spatial.py: ONE simulation decomposed into x-slabs over the mesh via
    shard_map, with ppermute halo exchange for short-range forces (the
    cell-list analog across chips; validated on the 8-device CPU mesh)
"""
from .replicas import ReplicaFarm  # noqa: F401
from .spatial import make_spatial_force_fn, partition_slabs  # noqa: F401
