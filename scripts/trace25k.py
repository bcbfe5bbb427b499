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
    import json
    n_batches = int(os.environ.get("TRACE_BATCHES", "14"))
    batch = int(os.environ.get("TRACE_BATCH", "100"))
    trace = []
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
        trace.append([int((k + 1) * batch), round(float(T), 2)])
        print(f"steps {(k+1)*batch:5d}  T={T:10.1f}  pe={pe:14.1f}",
              flush=True)
        if not np.isfinite(T) or T > 2000:
            break
    if os.environ.get("TRACE_OUT"):
        # thermostat-audit artifact (VERDICT r4 ask #3): the long NVT
        # trace with mean/drift stats over the second half
        Ts = np.asarray([t for _, t in trace])
        h = len(Ts) // 2
        half = Ts[h:]
        steps_arr = np.asarray([s for s, _ in trace], np.float64)
        slope = float(np.polyfit(steps_arr[h:], half, 1)[0]) * 1000.0
        out = {
            "target_K": 310.0, "gamma_per_ps": 1.0, "dt_fs": 2.0,
            "n_steps": int(trace[-1][0]), "batch": batch,
            "mean_T_second_half": round(float(half.mean()), 2),
            "std_T_second_half": round(float(half.std()), 2),
            "drift_K_per_1000_steps_second_half": round(slope, 4),
            "trace": trace,
            "cadence": "light",
        }
        with open(os.environ["TRACE_OUT"], "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {os.environ['TRACE_OUT']}", flush=True)
    if os.environ.get("TRACE_SAVE_FIXTURE") == "1":
        # refresh the bench fixture with this properly-thermalized state
        # (the round-4 fixture rested at T~258 K: its maker equilibrated
        # too briefly, which made every short post-warmup T reading look
        # like a thermostat fault)
        np.savez(FIX, x=sim.positions_unsorted(),
                 v=sim.velocities_unsorted(),
                 box=np.asarray(sim.state.box))
        print(f"saved fixture at T={sim.temperature():.1f}", flush=True)


if __name__ == "__main__":
    main()
