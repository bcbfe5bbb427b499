"""Step-resolved T/pe trace of the 25k fixture — blowup bisection aid."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.fast_engine import FastSim
from molchanica_tpu.systems.bench_systems import build_solvated_protein

FIX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))),
    "molchanica_tpu", "systems", "data", "eq25k.npz")


def main():
    n_batches = int(os.environ.get("TRACE_BATCHES", "14"))
    batch = int(os.environ.get("TRACE_BATCH", "100"))
    asys = build_solvated_protein(n_residues=250, target_sites=25000, seed=3)
    d = np.load(FIX)
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=1.0),
                   temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0,
                   hydrogen_constraint=HydrogenConstraint.shake(),
                   dtype="float32", max_init_relaxation_iters=None,
                   neighbor_rebuild_every=20, seed=7)
    t0 = time.perf_counter()
    sim = FastSim(asys.topology, cfg, d["x"], box_extent=asys.box_extent,
                  velocities=d["v"])
    print(f"init {time.perf_counter()-t0:.0f}s tri="
          f"{os.environ.get('MOLCHANICA_FASTSIM_TRI', '1')}", flush=True)
    for k in range(n_batches):
        try:
            sim.step(0.002, batch)
        except Exception as e:
            print(f"batch {k} raised: {type(e).__name__} {str(e)[:120]}",
                  flush=True)
            break
        T = sim.temperature()
        pe = float(sim.state.pe_last)
        print(f"steps {(k+1)*batch:5d}  T={T:10.1f}  pe={pe:14.1f}",
              flush=True)
        if not np.isfinite(T) or T > 2000:
            break


if __name__ == "__main__":
    main()
