"""PME v3 (order-6 splines + matmul-DFT) validation.

Same gates as test_pme.py: exact plane-wave reciprocal sum, numeric
gradients, and equivalence of the generalized spline weights with the
closed-form order-4 ones.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from molchanica_tpu.constants import COULOMB_CONST
from molchanica_tpu.ops.pme import bspline4_weights, ewald_beta_for
from molchanica_tpu.ops.pme3 import (bspline_weights, default_grid6,
                                     make_pme3_recip_fn)


def test_bspline_weights_order4_matches_closed_form():
    t = jnp.asarray(np.random.default_rng(0).uniform(0, 1, 64))
    w_rec = np.asarray(bspline_weights(t, 4))
    w_cf = np.asarray(bspline4_weights(t))
    np.testing.assert_allclose(w_rec, w_cf, atol=1e-12)


def test_bspline_weights_partition_of_unity():
    t = jnp.asarray(np.random.default_rng(1).uniform(0, 1, 64))
    for order in (4, 6):
        w = np.asarray(bspline_weights(t, order))
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-12)
        assert (w >= -1e-14).all()


def _exact_recip(pos, q, box, beta, mmax=14):
    e = 0.0
    vol = box.prod()
    for mx in range(-mmax, mmax + 1):
        for my in range(-mmax, mmax + 1):
            for mz in range(-mmax, mmax + 1):
                if mx == my == mz == 0:
                    continue
                kvec = 2 * np.pi * np.array([mx, my, mz]) / box
                k2 = (kvec * kvec).sum()
                s = (q * np.exp(1j * pos @ kvec)).sum()
                e += (4 * np.pi / k2 * np.exp(-k2 / (4 * beta ** 2))
                      * abs(s) ** 2)
    return e * COULOMB_CONST / (2 * vol)


def test_pme3_matches_exact_recip_random():
    rng = np.random.default_rng(4)
    n = 40
    box = np.array([12.0, 10.0, 15.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n)
    q -= q.mean()
    beta = ewald_beta_for(4.5, 1e-6)
    # coarse order-6 mesh (the production configuration, ~1.3 A spacing)
    recip = make_pme3_recip_fn(default_grid6(box, beta), beta, order=6,
                               dtype=jnp.float64)
    e = float(recip(jnp.asarray(pos), jnp.asarray(q), jnp.asarray(box)))
    e_exact = _exact_recip(pos, q, box, beta)
    np.testing.assert_allclose(e, e_exact, rtol=4e-4)


@pytest.mark.heavy
def test_pme3_force_matches_numeric_gradient():
    rng = np.random.default_rng(7)
    n = 16
    box = np.array([10.0, 10.0, 10.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n)
    q -= q.mean()
    beta = ewald_beta_for(4.0, 1e-5)
    recip = make_pme3_recip_fn((18, 18, 18), beta, order=6,
                               dtype=jnp.float64)
    f = lambda x: recip(x, jnp.asarray(q), jnp.asarray(box))
    g = jax.grad(f)(jnp.asarray(pos))
    h = 1e-5
    for _ in range(6):
        i, d = rng.integers(0, n), rng.integers(0, 3)
        xp = pos.copy(); xp[i, d] += h
        xm = pos.copy(); xm[i, d] -= h
        num = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) \
            / (2 * h)
        np.testing.assert_allclose(float(g[i, d]), num, rtol=1e-4,
                                   atol=1e-6)


def _grad_parity_case(dtype, chunk, rtol):
    """value_and_grad parity of custom_grad=True vs the autodiff path.

    Non-neutral charge set (covers the dq_bg background term) and n not
    divisible by chunk (covers the pad slots in the bwd fori_loop)."""
    rng = np.random.default_rng(23)
    n = 37                                     # not divisible by chunk=16
    box = np.array([11.0, 13.0, 12.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n) + 0.05              # net charge != 0
    beta = ewald_beta_for(4.5, 1e-5)
    grid = (16, 18, 16)
    kw = dict(order=6, dtype=dtype, chunk=chunk)
    r_auto = make_pme3_recip_fn(grid, beta, custom_grad=False, **kw)
    r_cust = make_pme3_recip_fn(grid, beta, custom_grad=True, **kw)
    x = jnp.asarray(pos, dtype)
    qq = jnp.asarray(q, dtype)
    b = jnp.asarray(box, dtype)

    def both(recip):
        (e, (gx, gq)) = jax.value_and_grad(recip, argnums=(0, 1))(x, qq, b)
        return np.asarray(e), np.asarray(gx), np.asarray(gq)

    ea, gxa, gqa = both(r_auto)
    ec, gxc, gqc = both(r_cust)
    assert gxc.dtype == np.dtype(dtype) and gqc.dtype == np.dtype(dtype)
    np.testing.assert_allclose(ec, ea, rtol=rtol)
    scale = max(np.abs(gxa).max(), 1e-8)
    np.testing.assert_allclose(gxc, gxa, rtol=rtol, atol=rtol * scale)
    qscale = max(np.abs(gqa).max(), 1e-8)
    np.testing.assert_allclose(gqc, gqa, rtol=rtol, atol=rtol * qscale)


@pytest.mark.heavy
def test_pme3_custom_grad_parity_f64():
    _grad_parity_case(jnp.float64, chunk=16, rtol=1e-10)


@pytest.mark.heavy
def test_pme3_custom_grad_parity_f32():
    _grad_parity_case(jnp.float32, chunk=16, rtol=2e-4)


def test_pme3_custom_grad_f32_primal_under_x64():
    """Regression for the round-3 RED suite: an f64 cotangent (x64 energy
    accumulation on top of f32 coordinates) must not trip custom_vjp's
    primal-dtype check (ops/pme3.py recip_bwd casts back)."""
    rng = np.random.default_rng(5)
    n = 24
    box = np.array([10.0, 10.0, 10.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n).astype(np.float32)
    beta = ewald_beta_for(4.0, 1e-5)
    recip = make_pme3_recip_fn((16, 16, 16), beta, order=6,
                               dtype=jnp.float32, chunk=16,
                               custom_grad=True)
    x = jnp.asarray(pos, jnp.float32)
    qq = jnp.asarray(q)
    b = jnp.asarray(box, jnp.float32)

    def loss(x_, q_):
        # f64 tail exactly like an x64-mode energy sum downstream
        return recip(x_, q_, b).astype(jnp.float64) * 2.0

    gx, gq = jax.grad(loss, argnums=(0, 1))(x, qq)
    assert gx.dtype == jnp.float32 and gq.dtype == jnp.float32
    assert np.isfinite(np.asarray(gx)).all()


def test_pme3_matches_pme2_on_f32():
    """Production-precision cross-check against the v2 path."""
    from molchanica_tpu.ops.pme2 import make_pme2_recip_fn
    rng = np.random.default_rng(11)
    n = 200
    box = np.array([20.0, 20.0, 20.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n).astype(np.float32)
    q -= q.mean()
    beta = ewald_beta_for(6.0, 1e-5)
    r2 = make_pme2_recip_fn((20, 20, 20), beta, dtype=jnp.float32)
    r3 = make_pme3_recip_fn((16, 16, 16), beta, order=6, dtype=jnp.float32)
    x = jnp.asarray(pos, jnp.float32)
    qq = jnp.asarray(q)
    b = jnp.asarray(box, jnp.float32)
    e2 = float(r2(x, qq, b))
    e3 = float(r3(x, qq, b))
    assert abs(e3 - e2) / max(abs(e2), 1.0) < 2e-3
