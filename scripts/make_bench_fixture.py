"""Generate the pre-equilibrated 25k-site bench fixture used by bench.py.

Runs on the TPU (or any JAX backend): builds the config-3 system
deterministically (seed 3), minimizes, ramps through staged force-capped
dynamics to 2 fs production conditions, and writes
molchanica_tpu/systems/data/eq25k.npz (positions, velocities, box).

Total wall time on one chip: ~15-25 min (dominated by equilibration steps).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from molchanica_tpu.md.config import (     # noqa: E402
    HydrogenConstraint, Integrator, MdConfig)
from molchanica_tpu.md.fast_engine import FastSim          # noqa: E402
from molchanica_tpu.systems.bench_systems import (         # noqa: E402
    build_solvated_protein)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "molchanica_tpu", "systems", "data", "eq25k.npz")


def main():
    t0 = time.perf_counter()
    asys = build_solvated_protein(n_residues=250, target_sites=25000, seed=3)
    print(f"build {time.perf_counter()-t0:.0f}s "
          f"n={asys.topology.n_atoms_real}", flush=True)

    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=5.0),
        temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0,
        hydrogen_constraint=HydrogenConstraint.shake(),
        dtype="float32", max_init_relaxation_iters=None,
        neighbor_rebuild_every=20, seed=7,
    )
    sim = FastSim(asys.topology, cfg, asys.positions,
                  box_extent=asys.box_extent)
    print("PE0:", sim.potential_energy(), flush=True)

    e = sim.minimize(400)
    print(f"minimized: E={e:.0f}", flush=True)

    for dt, n, cap in ((0.0005, 400, 2000.0), (0.001, 600, 5000.0),
                       (0.002, 1000, None), (0.002, 3000, None),
                       (0.002, 4000, None)):
        t1 = time.perf_counter()
        sim.step(dt, n, force_cap=cap)
        print(f"eq dt={dt} n={n}: {time.perf_counter()-t1:.0f}s "
              f"T={sim.temperature():.0f} PE={sim.potential_energy():.0f}",
              flush=True)

    np.savez_compressed(OUT, x=sim.positions_unsorted(),
                        v=sim.velocities_unsorted(),
                        box=np.asarray(asys.box_extent))
    print("wrote", OUT, "final T", sim.temperature(), flush=True)


if __name__ == "__main__":
    main()
