"""Per-phase profile of the 25k FastSim step on the real chip.

Times each component of the hot path separately (block_until_ready between
repeats), printing a ms budget the optimization work is steered by.
Run: python scripts/profile_step.py [--quick]
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


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    quick = "--quick" in sys.argv
    n_res = 60 if quick else 250
    target = 6000 if quick else 25000
    asys = build_solvated_protein(n_residues=n_res, target_sites=target,
                                  seed=3)
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=1.0),
        temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0,
        hydrogen_constraint=HydrogenConstraint.shake(),
        dtype="float32", max_init_relaxation_iters=None,
        neighbor_rebuild_every=20, seed=7)
    x0, vel = asys.positions, None
    if not quick and os.path.exists(FIXTURE):
        d = np.load(FIXTURE)
        if d["x"].shape[0] == asys.positions.shape[0]:
            x0, vel = d["x"], d["v"]
            print("[profile] using eq fixture", file=sys.stderr)
    t0 = time.perf_counter()
    sim = FastSim(asys.topology, cfg, x0, box_extent=asys.box_extent,
                  velocities=vel if vel is not None else None)
    print(f"[profile] init {time.perf_counter()-t0:.0f}s  S={sim.S} "
          f"n={asys.topology.n_atoms_real} waters={sim.n_waters} "
          f"hclusters={sim.n_h_constraints}", file=sys.stderr)

    st = sim.state
    res = {}

    # 1. colpair kernel alone
    def colpair_only(st):
        x_v = sim._apply_vsites(st.x, st.vsite_idx, st.box, st.vm_of)
        rows = jnp.concatenate([x_v, st.props,
                                jnp.zeros((sim.S, 0), jnp.float32)], axis=1)
        return sim._direct(rows, rows.T, st.wl, st.nw, st.box, st.couple)
    res["colpair_kernel"] = timeit(jax.jit(colpair_only), st)

    # 2. PME recip energy + grad
    q = st.props[:, 0] / np.sqrt(float(
        __import__("molchanica_tpu.constants", fromlist=["COULOMB_CONST"])
        .COULOMB_CONST))

    def pme_eg(st):
        return jax.value_and_grad(
            lambda x: sim._recip(x, q, st.box))(st.x)
    res["pme_recip_e_and_grad"] = timeit(jax.jit(pme_eg), st)

    # 3. full force
    force = sim._make_force_fn(None)
    res["force_full"] = timeit(jax.jit(lambda s: force(s.x, s)), st)

    # 4. constraints: position projection and velocity projection
    cp, cv = sim._make_cp_cv()
    if cp is not None:
        res["constrain_positions"] = timeit(
            jax.jit(lambda s: cp(s.x + 0.001, s.x, s)), st)
        res["constrain_velocities"] = timeit(
            jax.jit(lambda s: cv(s.v, s.x, s)), st)

    # 5. vsites apply + spread
    res["vsites_apply"] = timeit(
        jax.jit(lambda s: sim._apply_vsites(s.x, s.vsite_idx, s.box,
                                            s.vm_of)), st)
    res["vsites_spread"] = timeit(
        jax.jit(lambda s: sim._spread_vsite_forces(
            s.v, s.vsite_idx, s.vp_of, s.vp_role, s.vm_of)), st)

    # 6. rebuild
    res["rebuild"] = timeit(sim._rebuild_jit, st)

    # 7. whole chunk (20 steps) -> per-step
    fn = sim._get_chunk_fn(0.002, cfg.neighbor_rebuild_every, False, None)
    ms = timeit(fn, st, n=5)
    res["chunk_total"] = ms
    res["chunk_per_step"] = ms / cfg.neighbor_rebuild_every

    for k, v in res.items():
        print(f"{k:28s} {v:9.3f} ms")
    nsday = 0.002 / (res["chunk_per_step"] / 1000.0) * 86.4
    print(f"{'-> ns/day (chunk basis)':28s} {nsday:9.2f}")


if __name__ == "__main__":
    main()
