"""A/B rolled vs compact SETTLE inside one process (one init cost).

MOLCHANICA_SETTLE is read at _make_cp_cv time, so two chunk programs can
be built from one FastSim. Cache-busted via distinct dt values (timing
difference from dt is nil). Run on the chip.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.fast_engine import FastSim
from molchanica_tpu.systems.bench_systems import build_solvated_protein

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "molchanica_tpu", "systems", "data", "eq25k.npz")


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
    os.environ["MOLCHANICA_SETTLE"] = "rolled"    # init path
    sim = FastSim(asys.topology, cfg, d["x"], box_extent=asys.box_extent,
                  velocities=d["v"])
    print(f"[ab] init {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)
    k = cfg.neighbor_rebuild_every
    st = sim.state
    for mode, dt in (("rolled", 0.002), ("compact", 0.0020001)):
        os.environ["MOLCHANICA_SETTLE"] = mode
        fn = sim._get_chunk_fn(dt, k, False, None)
        r = fn(st)
        jax.block_until_ready(r[0].x)
        best = 1e30
        for _ in range(4):
            t0 = time.perf_counter()
            r = fn(st)
            jax.block_until_ready(r[0].x)
            best = min(best, time.perf_counter() - t0)
        print(f"settle={mode:8s} chunk_ms_per_step={best / k * 1000.0:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
