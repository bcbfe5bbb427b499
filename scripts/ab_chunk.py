"""Quick A/B: time the production chunk program (k=20) on the chip.

Prints chunk ms/step for the current env/config. Knobs of interest:
  MOLCHANICA_CADENCE=light|strict   (overrides cfg integrator cadence)
  MOLCHANICA_CHUNK_PERIODS          (dispatch amortization)
Run: python scripts/ab_chunk.py [--quick]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_chip_cache")

import jax
import numpy as np

from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.fast_engine import FastSim
from molchanica_tpu.systems.bench_systems import build_solvated_protein

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "molchanica_tpu", "systems", "data", "eq25k.npz")


def main():
    quick = "--quick" in sys.argv
    cadence = os.environ.get("MOLCHANICA_CADENCE", "light")
    n_res = 60 if quick else 250
    target = 6000 if quick else 25000
    asys = build_solvated_protein(n_residues=n_res, target_sites=target,
                                  seed=3)
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=1.0, cadence=cadence),
        temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0,
        hydrogen_constraint=HydrogenConstraint.shake(),
        dtype="float32", max_init_relaxation_iters=None,
        neighbor_rebuild_every=20, seed=7)
    x0, vel = asys.positions, None
    if not quick and os.path.exists(FIXTURE):
        d = np.load(FIXTURE)
        if d["x"].shape[0] == asys.positions.shape[0]:
            x0, vel = d["x"], d["v"]
    t0 = time.perf_counter()
    sim = FastSim(asys.topology, cfg, x0, box_extent=asys.box_extent,
                  velocities=vel)
    print(f"[ab] init {time.perf_counter()-t0:.0f}s cadence={cadence}",
          file=sys.stderr, flush=True)
    k = cfg.neighbor_rebuild_every
    fn = sim._get_chunk_fn(0.002, k, False, None)
    st = sim.state
    r = fn(st)
    jax.block_until_ready(r[0].x)
    best = 1e30
    for _ in range(4):
        t0 = time.perf_counter()
        r = fn(st)
        jax.block_until_ready(r[0].x)
        best = min(best, time.perf_counter() - t0)
    ms = best / k * 1000.0
    # 100-step T sanity
    sim.step(0.002, 100)
    print(f"cadence={cadence} chunk_ms_per_step={ms:.3f} "
          f"T={sim.temperature():.1f}")


if __name__ == "__main__":
    main()
