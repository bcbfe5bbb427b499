"""On-chip colpair kernel micro-benchmark (one ICL setting per process).

Times sort / window-build / kernel on the 25k bench fixture without full
FastSim init. Run: MOLCHANICA_ICL=32 python scripts/sweep_colpair.py
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
from molchanica_tpu.ops.pallas.colpair import (
    ICL, make_colpair_direct_fn, make_sort_fn, make_window_fn, plan_columns)
from molchanica_tpu.ops.pme import ewald_beta_for
from molchanica_tpu.systems.bench_systems import build_solvated_protein

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "molchanica_tpu", "systems", "data", "eq25k.npz")

N_ITER = 20


def scan_time(fn, x0, n=N_ITER, reps=3):
    def prog(x):
        def body(x, _):
            out = fn(x)
            return x + 0.0 * out[:, :3].sum() if out.ndim > 1 else x, ()
        x, _ = jax.lax.scan(body, x, None, length=n)
        return x
    f = jax.jit(prog)
    jax.block_until_ready(f(x0))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x0))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def main():
    quick = "--quick" in sys.argv
    n_res = 60 if quick else 250
    target = 6000 if quick else 25000
    asys = build_solvated_protein(n_residues=n_res, target_sites=target,
                                  seed=3)
    top = asys.topology
    box = np.asarray(asys.box_extent, np.float64)
    x0 = np.asarray(asys.positions, np.float32)
    if not quick and os.path.exists(FIXTURE):
        d = np.load(FIXTURE)
        if d["x"].shape[0] == x0.shape[0]:
            x0 = np.asarray(d["x"], np.float32)
    rc = 9.0
    beta = float(ewald_beta_for(rc, 1e-5))
    ws, stride = int(top.water_start), int(top.water_site_count)
    n_wsites = int(top.water_count) * stride
    r_blob = float(top.water_r_oh) if top.water_count else 0.0
    n_base = top.n_atoms
    plan = plan_columns(box, rc, beta, top.n_atoms_real, n_base,
                        skin=1.0, r_blob=r_blob)
    S = plan.n_sorted
    print(f"[sweep] ICL={ICL} S={S} NC={plan.n_clusters} "
          f"nx,ny={plan.nx},{plan.ny}", file=sys.stderr)

    # base-order props
    q = np.asarray(top.charges) * np.asarray(top.atom_mask)
    gid = np.arange(n_base, dtype=np.float64)
    if n_wsites:
        wi = np.arange(n_wsites)
        gid[ws:ws + n_wsites] = ws + stride * (wi // stride)
    props = np.stack([q * np.sqrt(COULOMB_CONST),
                      np.asarray(top.lj_sigma) / 2.0,
                      2.0 * np.sqrt(np.asarray(top.lj_eps)),
                      np.asarray(top.couple_mask),
                      (gid + 1.0) * np.asarray(top.atom_mask)],
                     axis=1).astype(np.float32)

    # host-side identity sort to sorted layout
    sort = jax.jit(make_sort_fn(plan))
    role = np.where((np.arange(n_base) >= ws)
                    & (np.arange(n_base) < ws + n_wsites),
                    (np.arange(n_base) - ws) % max(stride, 1), 0)
    owner = np.arange(n_base) - role
    boxj = jnp.asarray(box, jnp.float32)
    perm, keys, col_start, ovf = sort(
        jnp.asarray(x0), boxj, jnp.asarray(props[:, 4]),
        jnp.asarray(owner, jnp.int32))
    assert int(ovf) == 0
    perm_np = np.asarray(perm)
    base_ext = np.concatenate(
        [np.concatenate([x0, props], axis=1),
         np.array([[1e6, 1e6, 1e6, 0, 0, 0, 0, 0]], np.float32)], 0)
    rows_np = base_ext[perm_np]
    rows = jnp.asarray(rows_np)
    pT = jnp.asarray(rows_np.T.copy())
    tri = os.environ.get("MOLCHANICA_TRI", "1") == "1"
    win = jax.jit(make_window_fn(plan, triangular=tri))
    wl, nw, wovf = win(rows[:, :3], keys, boxj,
                       rows[:, 7], col_start)
    assert int(wovf) == 0, int(wovf)
    # occupancy estimate: window slots vs real in-cutoff pairs
    wl_np = np.asarray(wl).reshape(plan.n_clusters, -1, 3)
    nw_np = np.asarray(nw)
    slots = 0
    for c in range(plan.n_clusters):
        for e in range(nw_np[c]):
            lo, hi, _ = wl_np[c, e]
            if hi > lo:
                s0 = lo // 128
                slots += ((hi + 127) // 128 - s0) * 128
    pair_slots = slots * ICL
    print(f"[sweep] pair slots/step: {pair_slots/1e6:.1f}M", file=sys.stderr)

    direct = make_colpair_direct_fn(plan, has_alch=False, want_energy=True,
                                    triangular=tri)

    def kern(x):
        r = jnp.concatenate([x, rows[:, 3:]], axis=1)
        f, elj, ec = direct(r, r.T, wl, nw, boxj,
                            jnp.asarray(1.0, jnp.float32))
        return f

    ms = scan_time(kern, rows[:, :3])
    gsl = pair_slots / (ms * 1e-3) / 1e9
    print(f"[sweep] kernel {ms:.3f} ms  ({gsl:.1f} G slots/s)",
          file=sys.stderr)

    # A/B: force-only and erfcx-degree-8 variants
    import dataclasses
    xmax = float(plan.beta) * plan.cutoff + 1e-3
    from molchanica_tpu.ops.pallas.colpair import erfcx_cheb_coeffs
    plan8 = dataclasses.replace(
        plan, erfcx_coeffs=tuple(float(v)
                                 for v in erfcx_cheb_coeffs(xmax, deg=8)))
    for label, we, pl_use in (("force_only", False, plan),
                              ("energy_erfcx8", True, plan8),
                              ("force_only_erfcx8", False, plan8)):
        d2 = make_colpair_direct_fn(pl_use, has_alch=False, want_energy=we,
                                    triangular=tri)

        def kern2(x, d2=d2):
            r = jnp.concatenate([x, rows[:, 3:]], axis=1)
            f, elj, ec = d2(r, r.T, wl, nw, boxj,
                            jnp.asarray(1.0, jnp.float32))
            return f

        # correctness vs baseline before timing
        f_ref = np.asarray(kern(rows[:, :3]))
        f_ab = np.asarray(kern2(rows[:, :3]))
        rel = np.abs(f_ab - f_ref).max() / max(np.abs(f_ref).max(), 1e-9)
        ms2 = scan_time(kern2, rows[:, :3])
        print(f"[sweep] {label:18s} {ms2:.3f} ms  (rel vs base {rel:.1e})",
              file=sys.stderr)

    def sort_fn(x):
        p, k, cs, o = sort(x, boxj, jnp.asarray(props[:, 4]),
                           jnp.asarray(owner, jnp.int32))
        return k[:, None] * jnp.ones((1, 3), jnp.float32)

    ms_sort = scan_time(sort_fn, jnp.asarray(x0), n=5)

    def win_fn(x):
        w, nn, o = win(x, keys, boxj, rows[:, 7], col_start)
        return w[:, :3].astype(jnp.float32)

    ms_win = scan_time(win_fn, rows[:, :3], n=5)
    print(f"[sweep] sort {ms_sort:.3f} ms  windows {ms_win:.3f} ms",
          file=sys.stderr)

    # --- rebuild-phase micro-parts: argsort alone, scatter alone
    kint = jnp.asarray(np.asarray(keys), jnp.int32)

    def argsort_only(x):
        k2 = kint + x[:, 0].astype(jnp.int32)[:S] * 0
        o = jnp.argsort(k2, stable=True)
        return o[:, None].astype(jnp.float32) * jnp.ones((1, 3), jnp.float32)

    ms_as = scan_time(argsort_only, rows[:, :3], n=5)

    def scatter_only(x):
        idx = jnp.argsort(kint)      # reuse; measures argsort+1 scatter
        out = jnp.zeros((S,), jnp.int32).at[idx].set(
            jnp.arange(S, dtype=jnp.int32))
        return out[:, None].astype(jnp.float32) * jnp.ones((1, 3),
                                                           jnp.float32)

    ms_sc = scan_time(scatter_only, rows[:, :3], n=5)
    print(f"[sweep] argsort {ms_as:.3f} ms  argsort+scatter {ms_sc:.3f} ms",
          file=sys.stderr)
    print(f'{{"icl": {ICL}, "tri": {int(tri)}, "kernel_ms": {ms:.3f}, '
          f'"pair_slots_M": {pair_slots/1e6:.1f}, '
          f'"gslots_s": {gsl:.1f}, "sort_ms": {ms_sort:.3f}, '
          f'"win_ms": {ms_win:.3f}}}')


if __name__ == "__main__":
    main()
