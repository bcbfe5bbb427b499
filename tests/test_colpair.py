"""Colpair direct-space kernel vs a dense f64 reference.

The kernel runs in Pallas interpret mode on the CPU test mesh; the reference
recomputes every pair densely with scipy's exact erfc, so this validates the
window construction (coverage, no double counting, periodic shifts) AND the
in-kernel arithmetic (poly-erfc, rsqrt LJ) end to end.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molchanica_tpu.constants import COULOMB_CONST
from molchanica_tpu.ops.pallas.colpair import (
    ICL,
    R2_MIN,
    make_colpair_direct_fn,
    make_sort_fn,
    make_window_fn,
    pairlist_colpair_energy,
    plan_columns,
)
from molchanica_tpu.ops.pme import ewald_beta_for


def _random_system(n, box, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, 3)) * box
    x[: n // 10] += box * rng.integers(-1, 2, (n // 10, 3))  # out-of-box
    q = rng.normal(0, 0.4, n)
    sig = rng.uniform(2.6, 3.4, n)
    eps = rng.uniform(0.05, 0.25, n)
    return x, q, sig, eps


def _dense_reference(xw, q, sig, eps, box, rc, beta, couple_mask=None,
                     couple=1.0):
    from scipy.special import erfc
    q_kc = q * np.sqrt(COULOMB_CONST)
    d = xw[:, None, :] - xw[None, :, :]
    d -= box * np.round(d / box)
    r2 = (d ** 2).sum(-1)
    np.fill_diagonal(r2, 1e9)
    valid = r2 < rc * rc
    r2s = np.clip(r2, R2_MIN, rc * rc)
    inv_r = 1.0 / np.sqrt(r2s)
    inv_r2 = inv_r ** 2
    sh = sig / 2.0
    s = sh[:, None] + sh[None, :]
    eps4 = np.outer(2 * np.sqrt(eps), 2 * np.sqrt(eps))
    kqq = np.outer(q_kc, q_kc)
    from molchanica_tpu.ops.pallas.colpair import (
        _S2_HI, _S2_LO, _S2_W, SC_ALPHA, SC_SIG2_MIN)
    a_lj = 0.0
    inv_rc = inv_r
    if couple_mask is not None:
        cm = couple_mask
        is_alch = cm[:, None] + cm[None, :] - 2 * np.outer(cm, cm)
        cpl = 1.0 - is_alch * (1.0 - couple)
        eps4 = eps4 * cpl
        kqq = kqq * cpl
        # alchemical softcore (Beutler LJ + r^2-softcore Coulomb),
        # matching _pair_tile's alch branch
        a_lj = SC_ALPHA * (1.0 - cpl)
        soft_c = np.maximum((s * s), SC_SIG2_MIN) * a_lj
        inv_rc = 1.0 / np.sqrt(r2s + soft_c)
    s2_raw = (s * s) * inv_r2
    u = np.clip(s2_raw - _S2_LO, 0.0, _S2_W)
    s2 = np.minimum(s2_raw, _S2_HI) - u * u * (0.5 / _S2_W)
    gp = 1.0 - u * (1.0 / _S2_W)
    s6 = s2 ** 3
    invd = 1.0 / (a_lj * s6 + 1.0)
    s6 = s6 * invd
    s12 = s6 ** 2
    e_lj = eps4 * (s12 - s6)
    dlj = eps4 * inv_r2 * (gp * s2_raw) * (s2 * s2) * (invd * invd) \
        * (3.0 - 6.0 * s6)
    r = r2s * inv_r
    erfc_v = erfc(beta * r)
    e_c = kqq * erfc_v * inv_rc
    dc = -kqq * (beta / np.sqrt(np.pi) * np.exp(-(beta * r) ** 2)
                 * inv_r * inv_rc
                 + 0.5 * erfc_v * inv_rc ** 3)
    coeff = np.where(valid, dlj + dc, 0.0)
    F = -(2.0 * coeff[:, :, None] * d).sum(axis=1)
    return (0.5 * np.where(valid, e_lj, 0).sum(),
            0.5 * np.where(valid, e_c, 0).sum(), F)


def _run_colpair(x, q, sig, eps, box, rc, cm=None, couple=1.0, seed=0,
                 triangular=False):
    n = x.shape[0]
    beta = ewald_beta_for(rc, 1e-5)
    plan = plan_columns(box, rc, beta, n, n, skin=0.5)
    sort = jax.jit(make_sort_fn(plan))
    win = jax.jit(make_window_fn(plan, triangular=triangular))
    boxj = jnp.asarray(box, jnp.float32)
    maskj = jnp.ones((n,), jnp.float32)
    perm, keys, col_start, ovf = sort(
        jnp.asarray(x, jnp.float32), boxj, maskj)
    assert int(ovf) == 0
    perm_np = np.asarray(perm)
    q_kc = q * np.sqrt(COULOMB_CONST)
    cm_use = cm if cm is not None else np.zeros(n)
    xw = x - box * np.floor(x / box)
    # last column = exclusion-group id + 1 (unique per atom here: no
    # in-kernel exclusions; 0 marks the padded dummy row)
    base = np.concatenate([
        xw, np.stack([q_kc, sig / 2, 2 * np.sqrt(eps), cm_use,
                      1.0 + np.arange(n)], 1)], axis=1).astype(np.float32)
    base = np.concatenate(
        [base, np.array([[1e6, 1e6, 1e6, 0, 0, 0, 0, 0]], np.float32)], 0)
    rows = base[perm_np]
    mask_s = rows[:, 7]
    wl, nw, wovf = win(jnp.asarray(rows[:, :3]), keys, boxj,
                       jnp.asarray(mask_s), col_start)
    assert int(wovf) == 0
    direct = make_colpair_direct_fn(plan, has_alch=cm is not None,
                                    want_energy=True, interpret=True,
                                    triangular=triangular)
    f, e_lj, e_c = jax.jit(lambda r, p, w, nn: direct(
        r, p, w, nn, boxj, jnp.asarray(couple, jnp.float32)))(
        jnp.asarray(rows), jnp.asarray(rows.T.copy()), wl, nw)
    F = np.zeros((n + 1, 3))
    F[perm_np] = np.asarray(f)
    return float(e_lj), float(e_c), F[:n], plan


def test_colpair_matches_dense_reference():
    box = np.array([21.0, 22.0, 23.0])
    x, q, sig, eps = _random_system(600, box, seed=1)
    rc = 6.0
    beta = ewald_beta_for(rc, 1e-5)
    e_lj, e_c, F, _ = _run_colpair(x, q, sig, eps, box, rc)
    el_ref, ec_ref, F_ref = _dense_reference(
        x - box * np.floor(x / box), q, sig, eps, box, rc, beta)
    assert abs(e_lj - el_ref) / abs(el_ref) < 2e-5
    assert abs(e_c - ec_ref) / max(abs(ec_ref), 1.0) < 2e-5
    f_scale = np.abs(F_ref).max()
    assert np.abs(F - F_ref).max() / f_scale < 5e-5


def test_colpair_triangular_matches_dense():
    """Newton-3rd-law kernel: half-pair window table + j-side VMEM
    accumulator must reproduce the dense reference exactly like the
    symmetric kernel does."""
    box = np.array([21.0, 22.0, 23.0])
    x, q, sig, eps = _random_system(600, box, seed=4)
    rc = 6.0
    beta = ewald_beta_for(rc, 1e-5)
    e_lj, e_c, F, _ = _run_colpair(x, q, sig, eps, box, rc,
                                   triangular=True)
    el_ref, ec_ref, F_ref = _dense_reference(
        x - box * np.floor(x / box), q, sig, eps, box, rc, beta)
    assert abs(e_lj - el_ref) / abs(el_ref) < 2e-5
    assert abs(e_c - ec_ref) / max(abs(ec_ref), 1.0) < 2e-5
    f_scale = np.abs(F_ref).max()
    assert np.abs(F - F_ref).max() / f_scale < 5e-5


@pytest.mark.heavy
def test_colpair_rings2_matches_dense():
    """Ring-2 window geometry (narrow columns, disc-culled 5x5 window):
    same physics as the classic 3x3 — coverage, no double counting,
    periodic shifts — at ~35% fewer pair slots."""
    import molchanica_tpu.ops.pallas.colpair as cp
    box = np.array([21.0, 22.0, 23.0])
    x, q, sig, eps = _random_system(600, box, seed=7)
    rc = 6.0
    beta = ewald_beta_for(rc, 1e-5)
    import os
    os.environ["MOLCHANICA_RINGS"] = "2"
    try:
        e_lj, e_c, F, plan = _run_colpair(x, q, sig, eps, box, rc,
                                          triangular=True)
    finally:
        os.environ.pop("MOLCHANICA_RINGS", None)
    assert plan.rings == 2 and len(plan.offsets) > 9
    el_ref, ec_ref, F_ref = _dense_reference(
        x - box * np.floor(x / box), q, sig, eps, box, rc, beta)
    assert abs(e_lj - el_ref) / abs(el_ref) < 2e-5
    assert abs(e_c - ec_ref) / max(abs(ec_ref), 1.0) < 2e-5
    f_scale = np.abs(F_ref).max()
    assert np.abs(F - F_ref).max() / f_scale < 5e-5


@pytest.mark.heavy
def test_colpair_alchemical_coupling():
    box = np.array([20.0, 20.0, 20.0])
    x, q, sig, eps = _random_system(400, box, seed=2)
    # keep alchemical atoms clash-free so the linear (non-softcore) coupling
    # comparison is well-conditioned
    rc = 6.0
    beta = ewald_beta_for(rc, 1e-5)
    cm = np.zeros(400)
    cm[:20] = 1.0
    couple = 0.37
    e_lj, e_c, F, _ = _run_colpair(x, q, sig, eps, box, rc, cm=cm,
                                   couple=couple)
    el_ref, ec_ref, F_ref = _dense_reference(
        x - box * np.floor(x / box), q, sig, eps, box, rc, beta,
        couple_mask=cm, couple=couple)
    assert abs(e_lj - el_ref) / abs(el_ref) < 2e-5
    assert abs(e_c - ec_ref) / max(abs(ec_ref), 1.0) < 2e-5
    assert np.abs(F - F_ref).max() / np.abs(F_ref).max() < 5e-5


def test_pairlist_formula_matches_dense():
    """The exclusion-subtraction pair list uses the kernel's arithmetic."""
    box = np.array([20.0, 20.0, 20.0])
    x, q, sig, eps = _random_system(200, box, seed=3)
    rc = 6.0
    beta = ewald_beta_for(rc, 1e-5)
    plan = plan_columns(box, rc, beta, 200, 200, skin=0.5)
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 200, (64, 2)).astype(np.int32)
    idx = idx[idx[:, 0] != idx[:, 1]]
    q_kc = q * np.sqrt(COULOMB_CONST)
    e_lj, e_c = pairlist_colpair_energy(
        jnp.asarray(x, jnp.float32), jnp.asarray(box, jnp.float32),
        jnp.asarray(idx), jnp.ones((idx.shape[0],), jnp.float32),
        jnp.asarray(q_kc, jnp.float32), jnp.asarray(sig / 2, jnp.float32),
        jnp.asarray(2 * np.sqrt(eps), jnp.float32),
        jnp.zeros((200,), jnp.float32), jnp.asarray(1.0, jnp.float32), plan)
    # manual
    from scipy.special import erfc
    d = x[idx[:, 0]] - x[idx[:, 1]]
    d -= box * np.round(d / box)
    r2 = (d ** 2).sum(-1)
    ok = r2 < rc * rc
    r2s = np.clip(r2, R2_MIN, rc * rc)
    r = np.sqrt(r2s)
    sh = sig / 2
    s = sh[idx[:, 0]] + sh[idx[:, 1]]
    eps4 = (2 * np.sqrt(eps))[idx[:, 0]] * (2 * np.sqrt(eps))[idx[:, 1]]
    s6 = (s * s / r2s) ** 3
    el = (np.where(ok, eps4 * (s6 ** 2 - s6), 0)).sum()
    ec = (np.where(ok, q_kc[idx[:, 0]] * q_kc[idx[:, 1]]
                   * erfc(beta * r) / r, 0)).sum()
    assert abs(float(e_lj) - el) / max(abs(el), 1) < 2e-5
    assert abs(float(e_c) - ec) / max(abs(ec), 1) < 2e-5


def test_sigma_clamp_is_c1_and_two_path_consistent():
    """Regression for the round-3 25k explosion: the LJ sigma-clamp must be
    C1-smooth so that the kernel's analytic force and the exclusion
    subtraction's autodiff force agree even when their f32 r^2 round to
    opposite sides of a branch point. With the old hard clamp, the amide
    C-N bond (1.335 A = 0.4006 sigma) sat exactly on the kink and a one-ulp
    disagreement left the full ~1.3e5 kcal/mol/A LJ wall uncancelled."""
    from molchanica_tpu.ops.pallas.colpair import (
        _S2_HI, _S2_LO, _S2_MAX, _S2_W, _s2_clamped)

    # C1 properties of the cap
    xs = jnp.linspace(_S2_LO - 1.0, _S2_HI + 1.0, 4001)
    s2, gp = _s2_clamped(xs)
    below = xs < _S2_LO
    assert float(jnp.max(jnp.abs(s2[below] - xs[below]))) == 0.0
    assert abs(float(s2[-1]) - _S2_MAX) < 1e-6
    d_num = jnp.gradient(s2, xs[1] - xs[0])
    assert float(jnp.max(jnp.abs(d_num[2:-2] - gp[2:-2]))) < 2e-3
    assert bool(jnp.all(jnp.diff(s2) >= -1e-7))

    # two-path force consistency across the whole clamp neighbourhood:
    # analytic kernel dlj vs autodiff of the blended energy, at r2 and at
    # r2 +- 1 ulp (emulating the two paths' independent f32 rounding)
    eps4 = 0.48
    sig2 = 3.3249 ** 2         # amber amide C-N sigma_ij

    def e_of_r2(r2):
        s2c, _ = _s2_clamped(sig2 / r2)
        s6 = s2c * s2c * s2c
        return eps4 * (s6 * s6 - s6)

    g = jax.vmap(jax.grad(e_of_r2))
    r2v = np.linspace(1.2, 2.4, 4001).astype(np.float32)  # spans the band
    r2u = np.nextafter(r2v, 4.0, dtype=np.float32)        # +1 ulp path
    inv_r2 = 1.0 / r2v
    s2_raw = sig2 * inv_r2
    s2c, gpv = _s2_clamped(s2_raw)
    s6 = s2c * s2c * s2c
    dlj = eps4 * inv_r2 * (gpv * s2_raw) * (s2c * s2c) * (3.0 - 6.0 * s6)
    res_same = np.abs(np.asarray(g(jnp.asarray(r2v))) - np.asarray(dlj))
    res_ulp = np.abs(np.asarray(g(jnp.asarray(r2v)))
                     - np.asarray(g(jnp.asarray(r2u))))
    # old hard clamp: res_ulp peaked at ~1e5; C1 blend keeps it tiny
    assert res_same.max() < 1.0, res_same.max()
    assert res_ulp.max() < 5.0, res_ulp.max()


def test_colpair_force_only_kpoly_matches_energy_kernel():
    """The force-only kernel's Coulomb K-polynomial (dc = -kqq K(beta r)/r^3,
    coulomb_kpoly_coeffs) must reproduce the energy kernel's erfcx-path
    forces to the fit bound — the hot FastSim chunks run this variant."""
    from molchanica_tpu.ops.pallas.colpair import make_colpair_direct_fn

    box = np.array([21.0, 22.0, 23.0])
    x, q, sig, eps = _random_system(600, box, seed=5)
    rc = 6.0
    n = x.shape[0]
    beta = ewald_beta_for(rc, 1e-5)
    plan = plan_columns(box, rc, beta, n, n, skin=0.5)
    sort = jax.jit(make_sort_fn(plan))
    win = jax.jit(make_window_fn(plan, triangular=True))
    boxj = jnp.asarray(box, jnp.float32)
    perm, keys, col_start, _ = sort(
        jnp.asarray(x, jnp.float32), boxj, jnp.ones((n,), jnp.float32))
    q_kc = q * np.sqrt(COULOMB_CONST)
    xw = x - box * np.floor(x / box)
    base = np.concatenate([
        xw, np.stack([q_kc, sig / 2, 2 * np.sqrt(eps), np.zeros(n),
                      1.0 + np.arange(n)], 1)], axis=1).astype(np.float32)
    base = np.concatenate(
        [base, np.array([[1e6, 1e6, 1e6, 0, 0, 0, 0, 0]], np.float32)], 0)
    rows = jnp.asarray(base[np.asarray(perm)])
    wl, nw, _ = win(rows[:, :3], keys, boxj, rows[:, 7], col_start)
    couple = jnp.asarray(1.0, jnp.float32)
    f_e, _, _ = jax.jit(make_colpair_direct_fn(
        plan, has_alch=False, want_energy=True, interpret=True,
        triangular=True))(rows, rows.T, wl, nw, boxj, couple)
    f_ne, _, _ = jax.jit(make_colpair_direct_fn(
        plan, has_alch=False, want_energy=False, interpret=True,
        triangular=True))(rows, rows.T, wl, nw, boxj, couple)
    f_e = np.asarray(f_e)
    f_ne = np.asarray(f_ne)
    scale = np.abs(f_e).max()
    rel = np.abs(f_ne - f_e).max() / scale
    assert rel < 2e-5, rel
