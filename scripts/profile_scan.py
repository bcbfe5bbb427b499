"""In-scan per-phase profile of the 25k FastSim step on the real chip.

The axon relay has a ~2-3 ms per-dispatch floor, so standalone jit timings
overstate small ops. Here every phase is timed INSIDE a lax.scan with a data
dependency (N iterations, one dispatch), which measures the true on-chip cost.
Run: python scripts/profile_scan.py
"""
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

N_ITER = 50


def scan_time(fn_body, init, n=N_ITER, reps=3):
    """Time one jitted lax.scan of n iterations of fn_body; return ms/iter."""
    def prog(init):
        def body(c, _):
            return fn_body(c), None
        out, _ = jax.lax.scan(body, init, None, length=n)
        return out
    j = jax.jit(prog)
    r = j(init)
    jax.block_until_ready(r)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        r = j(init)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def main():
    asys = build_solvated_protein(n_residues=250, target_sites=25000, seed=3)
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=1.0),
        temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0,
        hydrogen_constraint=HydrogenConstraint.shake(),
        dtype="float32", max_init_relaxation_iters=None,
        neighbor_rebuild_every=20, seed=7)
    x0, vel = asys.positions, None
    if os.path.exists(FIXTURE):
        d = np.load(FIXTURE)
        if d["x"].shape[0] == asys.positions.shape[0]:
            x0, vel = d["x"], d["v"]
            print("[profile] using eq fixture", file=sys.stderr)
    t0 = time.perf_counter()
    sim = FastSim(asys.topology, cfg, x0, box_extent=asys.box_extent,
                  velocities=vel)
    print(f"[profile] init {time.perf_counter()-t0:.0f}s  S={sim.S}",
          file=sys.stderr)
    st = sim.state
    res = {}

    def dep(x, f):
        """Cheap data dependency: x shifted by a tiny multiple of f."""
        return x + 1e-12 * f

    # 1. colpair kernel alone (force-only variant = hot path)
    def colpair_body(x):
        rows = jnp.concatenate([x, st.props], axis=1)
        f, _, _ = sim._direct_ne(rows, rows.T, st.wl, st.nw, st.box,
                                 st.couple)
        return dep(x, f)
    res["colpair_ne"] = scan_time(colpair_body, st.x)

    def colpair_e_body(x):
        rows = jnp.concatenate([x, st.props], axis=1)
        f, el, ec = sim._direct(rows, rows.T, st.wl, st.nw, st.box,
                                st.couple)
        return dep(x, f + el + ec)
    res["colpair_energy"] = scan_time(colpair_e_body, st.x)

    # 2. PME alone (energy + grad, as used in e_rest)
    from molchanica_tpu.constants import COULOMB_CONST
    q = st.props[:, 0] / np.sqrt(COULOMB_CONST)

    def pme_body(x):
        e, g = jax.value_and_grad(lambda xx: sim._recip(xx, q, st.box))(x)
        return dep(x, g)
    res["pme_e_and_grad"] = scan_time(pme_body, st.x)

    # 3. full force (hot variant)
    force_ne = sim._make_force_fn(None, want_energy=False)

    def force_body(x):
        f, _ = force_ne(x, st)
        return dep(x, f)
    res["force_full_ne"] = scan_time(force_body, st.x)

    # 4. constraints
    cp, cv = sim._make_cp_cv()
    if cp is not None:
        def cp_body(x):
            xn = cp(x + 1e-7, x, st)
            return xn
        res["constrain_positions"] = scan_time(cp_body, st.x)

        def cv_body(v):
            return cv(v, st.x, st) * (1.0 - 1e-12)
        res["constrain_velocities"] = scan_time(cv_body, st.v)

    # 5. vsites
    def vs_body(x):
        return dep(x, sim._apply_vsites(x, st.vsite_idx, st.box, st.vm_of))
    res["vsites_apply"] = scan_time(vs_body, st.x)

    def vsp_body(f):
        return sim._spread_vsite_forces(f, st.vsite_idx, st.vp_of,
                                        st.vp_role, st.vm_of) * (1 - 1e-12)
    res["vsites_spread"] = scan_time(vsp_body, st.v)

    # 6. langevin noise (rng + normal, the per-step stochastic cost)
    def noise_body(c):
        k, v = c
        k, sub = jax.random.split(k)
        n = jax.random.normal(sub, v.shape, v.dtype)
        return (k, v + 1e-12 * n)
    res["rng_normal"] = scan_time(noise_body, (st.rng_key, st.v))

    # 7. e_rest grad WITHOUT pme (bonded + exclusions + corrections):
    #    force_full - colpair - pme is the implied remainder
    res["remainder_implied"] = (res["force_full_ne"] - res["colpair_ne"]
                                - res["pme_e_and_grad"])

    # 8. whole chunk per-step for reference
    fn = sim._get_chunk_fn(0.002, cfg.neighbor_rebuild_every, False, None)
    r = fn(st)
    jax.block_until_ready(r)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(st)
        jax.block_until_ready(r[0].x)
        best = min(best, time.perf_counter() - t0)
    res["chunk_per_step"] = best / cfg.neighbor_rebuild_every * 1000.0
    res["rebuild_amortized"] = 0.0  # included in chunk

    integ_implied = (res["chunk_per_step"] - res["force_full_ne"]
                     - res.get("constrain_positions", 0.0)
                     - res.get("constrain_velocities", 0.0))
    res["integ+rebuild_implied"] = integ_implied

    for k, v in res.items():
        print(f"{k:28s} {v:9.3f} ms")
    nsday = 0.002 / (res["chunk_per_step"] / 1000.0) * 86.4
    print(f"{'-> ns/day (chunk basis)':28s} {nsday:9.2f}")


if __name__ == "__main__":
    main()
