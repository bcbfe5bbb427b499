"""Mid-run MD checkpoint/resume.

The reference has NO mid-run restart (SURVEY.md §5 "checkpoint/resume": prefs
+ trajectory outputs only). Here the full dynamic state — positions,
velocities, box, RNG key, step count, coupling — round-trips through one npz
file, so a run resumes bit-exactly (same seed stream) on any host.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from .engine import MdSim
from .state import MdState

_FORMAT_VERSION = 1


def save_checkpoint(path, sim: MdSim, extra: dict = None):
    s = sim.state
    jax.block_until_ready(s.positions)
    meta = dict(
        version=_FORMAT_VERSION,
        method=sim.method,
        n_constraints=sim.n_constraints,
        wall_time=sim.computation_time(),
        extra=extra or {},
    )
    np.savez_compressed(
        path,
        positions=np.asarray(s.positions),
        velocities=np.asarray(s.velocities),
        box=(np.zeros(0) if s.box is None else np.asarray(s.box)),
        step=np.asarray(s.step),
        rng_key=np.asarray(jax.random.key_data(s.rng_key))
        if jnp.issubdtype(s.rng_key.dtype, jax.dtypes.prng_key)
        else np.asarray(s.rng_key),
        couple=np.asarray(s.couple),
        pe_last=np.asarray(s.pe_last),
        ke_last=np.asarray(s.ke_last),
        dhdl_last=np.asarray(s.dhdl_last),
        meta=json.dumps(meta),
    )
    return path


def load_checkpoint(path, sim: MdSim) -> MdSim:
    """Restore dynamic state into an MdSim built with the same topology/cfg."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} unsupported")
    dtype = sim.state.positions.dtype
    key_raw = z["rng_key"]
    key = sim.state.rng_key
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.wrap_key_data(jnp.asarray(key_raw))
    else:
        key = jnp.asarray(key_raw, key.dtype)
    box = None if z["box"].size == 0 else jnp.asarray(z["box"], dtype)
    sim.state = MdState(
        positions=jnp.asarray(z["positions"], dtype),
        velocities=jnp.asarray(z["velocities"], dtype),
        box=box,
        step=jnp.asarray(int(z["step"]), jnp.int32),
        rng_key=key,
        couple=jnp.asarray(z["couple"], dtype),
        pe_last=jnp.asarray(z["pe_last"], dtype),
        ke_last=jnp.asarray(z["ke_last"], dtype),
        dhdl_last=jnp.asarray(z["dhdl_last"], dtype),
    )
    sim._wall_time = float(meta.get("wall_time", 0.0))
    return sim
