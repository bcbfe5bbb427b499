"""Fine-grained on-chip profile of the FastSim force remainder.

The axon relay has a ~2-3 ms per-dispatch floor, so each candidate is
iterated N times INSIDE one jitted lax.scan (with a data dependency between
iterations so XLA cannot hoist the body) and the floor amortizes away.

Run: python scripts/profile_rest.py [--quick]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from molchanica_tpu.constants import COULOMB_CONST
from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.fast_engine import FastSim
from molchanica_tpu.ops.bonded import (angle_energy, bond_energy,
                                       dihedral_energy)
from molchanica_tpu.ops.pallas.colpair import pairlist_colpair_energy
from molchanica_tpu.ops.pbc import minimum_image
from molchanica_tpu.systems.bench_systems import build_solvated_protein

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "molchanica_tpu", "systems", "data", "eq25k.npz")

N_ITER = 20


def scan_time(make_body, x0, n=N_ITER, reps=3):
    """Time one jitted scan of n dependent body iterations; ms per iter."""

    def prog(x):
        def body(x, _):
            out = make_body(x)
            # fold a tiny function of the output back into x: keeps a data
            # dependency without changing the physics being timed
            x = x + 0.0 * out
            return x, ()

        x, _ = jax.lax.scan(body, x, None, length=n)
        return x

    fn = jax.jit(prog)
    r = fn(x0)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x0))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


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
    t0 = time.perf_counter()
    sim = FastSim(asys.topology, cfg, x0, box_extent=asys.box_extent,
                  velocities=vel)
    print(f"[rest] init {time.perf_counter()-t0:.0f}s S={sim.S}",
          file=sys.stderr)

    st = sim.state
    top = sim.top
    plan = sim.plan
    beta = sim.beta
    box = st.box
    couple = st.couple
    props = st.props
    q_kc = props[:, 0]
    sh = props[:, 1]
    se = props[:, 2]
    cm = props[:, 3]
    q_plain = q_kc / np.sqrt(COULOMB_CONST)
    scee = sim._p14_scee
    scnb = sim._p14_scnb

    res = {}

    # --- the colpair kernel alone
    rowsT_cache = {}

    def colpair(x):
        rows = jnp.concatenate([x, props], axis=1)
        f, elj, ec = sim._direct(rows, rows.T, st.wl, st.nw, box, couple)
        return f

    res["colpair"] = scan_time(colpair, st.x)

    # --- PME recip: fwd only, then fwd+grad
    q_eff = q_plain

    def recip_fwd(x):
        return sim._recip(x, q_eff, box) * jnp.ones((1, 3))

    res["recip_fwd"] = scan_time(recip_fwd, st.x)

    def recip_grad(x):
        e, g = jax.value_and_grad(lambda xx: sim._recip(xx, q_eff, box))(x)
        return g

    res["recip_grad"] = scan_time(recip_grad, st.x)

    # --- bonded terms grad
    def bonded(x):
        def e(xx):
            return (bond_energy(xx, box, st.bond_idx, top.bond_k,
                                top.bond_r0)
                    + angle_energy(xx, box, st.angle_idx, top.angle_k,
                                   top.angle_theta0)
                    + dihedral_energy(xx, box, st.dihedral_idx,
                                      top.dihedral_k, top.dihedral_n,
                                      top.dihedral_phase))
        return jax.grad(e)(x)

    res["bonded_grad"] = scan_time(bonded, st.x)

    # --- exclusion pairlist (kernel-matching) grad
    def excl(x):
        def e(xx):
            el, ec = pairlist_colpair_energy(
                xx, box, st.excl_idx, sim._excl_mask, q_kc, sh, se,
                cm, couple, plan)
            return el + ec
        return jax.grad(e)(x)

    res["excl_pairlist_grad"] = scan_time(excl, st.x)

    # --- erf exclusion correction grad (solute pairlist part)
    def erfx(x):
        def e(xx):
            i = st.excl_idx[:, 0]
            j = st.excl_idx[:, 1]
            dd = minimum_image(xx[i] - xx[j], box)
            rr = jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, -1), 1e-4))
            return -COULOMB_CONST * jnp.sum(
                sim._excl_mask * q_plain[i] * q_plain[j]
                * jax.scipy.special.erf(beta * rr) / rr)
        return jax.grad(e)(x)

    res["erf_excl_grad"] = scan_time(erfx, st.x)

    # --- rolled intra-water erf compensation grad
    def werf(x):
        def e(xx):
            m_o_mask = (st.w_role == 0) & (st.props[:, 4] > 0)
            ew = 0.0
            xs = [xx] + [jnp.roll(xx, -k, 0)
                         for k in range(1, sim._wstride)]
            for a in range(sim._wstride):
                for b in range(a + 1, sim._wstride):
                    qq = sim._wq[a] * sim._wq[b]
                    if abs(qq) < 1e-12:
                        continue
                    dd = minimum_image(xs[b] - xs[a], box)
                    rr = jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, -1), 1e-4))
                    ew = ew - COULOMB_CONST * qq * jnp.sum(
                        jnp.where(m_o_mask,
                                  jax.scipy.special.erf(beta * rr) / rr,
                                  0.0))
            return ew
        return jax.grad(e)(x)

    res["water_erf_grad"] = scan_time(werf, st.x)

    # --- constraint projection (position) alone
    cp, cv = sim._make_cp_cv()
    if cp is not None:
        def cpf(x):
            return cp(x + 0.001, x, st)
        res["constrain_pos"] = scan_time(cpf, st.x)
    if cv is not None:
        def cvf(x):
            return cv(x * 0.001, x, st)
        res["constrain_vel"] = scan_time(cvf, st.x)

    # --- 1-4 block (pairlist subtract + scaled + erf) grad
    def p14(x):
        def e(xx):
            el, ec = pairlist_colpair_energy(
                xx, box, st.p14_idx, top.pair14_mask, q_kc, sh, se,
                cm, couple, plan)
            i = st.p14_idx[:, 0]
            j = st.p14_idx[:, 1]
            d = minimum_image(xx[i] - xx[j], box)
            r2 = jnp.maximum(jnp.sum(d * d, -1), 1e-4)
            inv_r = jax.lax.rsqrt(r2)
            sig = sh[i] + sh[j]
            eps4 = se[i] * se[j]
            s6 = (sig * sig / r2) ** 3
            pm = top.pair14_mask
            e14 = jnp.sum(pm * scnb * eps4 * (s6 * s6 - s6)) \
                + jnp.sum(pm * scee * q_kc[i] * q_kc[j] * inv_r)
            rr = jnp.sqrt(r2)
            e4c = -COULOMB_CONST * jnp.sum(
                pm * q_plain[i] * q_plain[j]
                * jax.scipy.special.erf(beta * rr) / rr)
            return -el - ec + e14 + e4c
        return jax.grad(e)(x)

    res["p14_grad"] = scan_time(p14, st.x)

    # --- full force fn
    force = sim._make_force_fn(None)

    def full(x):
        f, (e, terms) = force(x, st)
        return f

    res["force_full"] = scan_time(full, st.x)

    # --- chunk per-step for reference
    fn = sim._get_chunk_fn(0.002, cfg.neighbor_rebuild_every, False, None)
    r = fn(st)
    jax.block_until_ready(r[0].x)
    t0 = time.perf_counter()
    r = fn(st)
    jax.block_until_ready(r[0].x)
    ms = (time.perf_counter() - t0) * 1000.0
    res["chunk_per_step"] = ms / cfg.neighbor_rebuild_every

    for k, v in res.items():
        print(f"{k:24s} {v:9.3f} ms")
    known = (res["colpair"] + res["recip_grad"] + res["bonded_grad"]
             + res["excl_pairlist_grad"] + res["erf_excl_grad"]
             + res["p14_grad"])
    print(f"{'sum(parts)':24s} {known:9.3f} ms  "
          f"(unattributed in force_full: {res['force_full']-known:.3f})")


if __name__ == "__main__":
    main()
