"""Chip A/B of the component-wise (structure-of-arrays) SETTLE path:
chunk ms/step with MOLCHANICA_SETTLE=rolled vs cw, plus isolated cp/cv
timings for each mode. The [S,3] rolled math keeps xyz as a minor dim of
3 (3 of 128 TPU lanes); cw holds x/y/z as separate [S] arrays."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.fast_engine import FastSim
from molchanica_tpu.systems.bench_systems import build_solvated_protein

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "molchanica_tpu", "systems", "data", "eq25k.npz")


def time_fn(fn, *args, n=6):
    r = fn(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    asys = build_solvated_protein(n_residues=250, target_sites=25000,
                                  seed=3)
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=1.0, cadence="light"),
        temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0,
        hydrogen_constraint=HydrogenConstraint.shake(),
        dtype="float32", max_init_relaxation_iters=None,
        neighbor_rebuild_every=20, seed=7)
    d = np.load(FIXTURE)
    t0 = time.perf_counter()
    sim = FastSim(asys.topology, cfg, d["x"], box_extent=asys.box_extent,
                  velocities=d["v"])
    print(f"[ab] init {time.perf_counter()-t0:.0f}s  "
          f"T0={sim.temperature():.1f}", file=sys.stderr, flush=True)
    k = cfg.neighbor_rebuild_every
    st = sim.state
    # N-iteration scan harness for the isolated cp/cv (single dispatch,
    # relay-floor free)
    for mode, dt in (("rolled", 0.002), ("cw", 0.0020001)):
        os.environ["MOLCHANICA_SETTLE"] = mode
        cp, cv = sim._make_cp_cv()

        @jax.jit
        def run_cp(x, xr):
            def body(c, _):
                return cp(c * 0.99999 + 1e-7, xr, st), None
            y, _ = jax.lax.scan(body, x, None, length=50)
            return y

        @jax.jit
        def run_cv(v, x):
            def body(c, _):
                return cv(c * 0.99999 + 1e-7, x, st), None
            y, _ = jax.lax.scan(body, v, None, length=50)
            return y

        tcp = time_fn(run_cp, st.x, st.x) / 50 * 1e3
        tcv = time_fn(run_cv, st.v, st.x) / 50 * 1e3
        fn = sim._get_chunk_fn(dt, k, False, None)
        tch = time_fn(lambda: fn(st), n=4) / k * 1e3
        print(f"settle={mode:6s} cp_ms={tcp:.3f} cv_ms={tcv:.3f} "
              f"chunk_ms_per_step={tch:.3f}", flush=True)
    # correctness on chip: 2k steps under cw must hold temperature
    os.environ["MOLCHANICA_SETTLE"] = "cw"
    sim._chunk_cache.clear()
    for b in range(2):
        sim.step(0.002, 1000)
        print(f"cw steps {(b+1)*1000:5d}  T={sim.temperature():8.1f}",
              flush=True)


if __name__ == "__main__":
    main()
