"""Test harness config: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding is validated here the JAX way — a host-platform device
count of 8 stands in for an 8-chip TPU slice (SURVEY.md §4 implication (d)).

Environment gotcha: this image injects the `axon` TPU tunnel via
PYTHONPATH=/root/.axon_site sitecustomize, which force-selects the axon
platform even if JAX_PLATFORMS=cpu is exported. The only reliable override
after interpreter start is jax.config.update('jax_platforms', 'cpu'), done
below BEFORE any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: many tests build near-identical FastSim /
# MdSim instances whose jitted programs lower to identical HLO; the disk
# cache compiles each distinct program once per MACHINE instead of once
# per test (the dominant cost of the "not slow" tier on a 1-CPU box).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MOLCHANICA_JAX_CACHE",
                                 "/tmp/molchanica_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
