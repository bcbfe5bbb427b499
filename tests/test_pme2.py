"""pme2 (matmul spreading) must match pme v1 (scatter spreading) exactly
in energy and gradient — same B-splines, same influence function."""
import numpy as np

import jax
import jax.numpy as jnp

from molchanica_tpu.ops.pme import ewald_beta_for, make_pme_recip_fn, spread_charges
from molchanica_tpu.ops.pme2 import make_pme2_recip_fn


def test_pme2_matches_pme1_energy_and_grad():
    rng = np.random.default_rng(0)
    n = 300
    box = np.array([18.0, 19.0, 20.0])
    x = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(0, 0.5, n)
    q -= q.mean()
    grid = (18, 20, 20)
    beta = ewald_beta_for(7.0, 1e-5)

    recip2 = make_pme2_recip_fn(grid, beta, dtype=jnp.float64, chunk=128)

    xj = jnp.asarray(x)
    qj = jnp.asarray(q)
    boxj = jnp.asarray(box)

    # v1 path (scatter) via the same influence math
    from molchanica_tpu.ops.pme import _bspline_b2
    from molchanica_tpu.constants import COULOMB_CONST

    def recip1(x_, q_, box_):
        g = spread_charges(x_, q_, box_, grid)
        S = jnp.fft.fftn(g)
        Kx, Ky, Kz = grid
        b2 = (jnp.asarray(_bspline_b2(Kx))[:, None, None]
              * jnp.asarray(_bspline_b2(Ky))[None, :, None]
              * jnp.asarray(_bspline_b2(Kz))[None, None, :])
        mx = jnp.asarray(np.fft.fftfreq(Kx) * Kx)
        my = jnp.asarray(np.fft.fftfreq(Ky) * Ky)
        mz = jnp.asarray(np.fft.fftfreq(Kz) * Kz)
        kx = 2 * jnp.pi * mx / box_[0]
        ky = 2 * jnp.pi * my / box_[1]
        kz = 2 * jnp.pi * mz / box_[2]
        k2 = kx[:, None, None] ** 2 + ky[None, :, None] ** 2 \
            + kz[None, None, :] ** 2
        k2s = jnp.where(k2 == 0, 1.0, k2)
        vol = box_[0] * box_[1] * box_[2]
        infl = jnp.where(k2 == 0, 0.0,
                         4 * jnp.pi / k2s * jnp.exp(-k2s / (4 * beta * beta)))
        e = COULOMB_CONST / (2 * vol) * jnp.sum(
            infl * b2 * (S.real ** 2 + S.imag ** 2))
        qt = jnp.sum(q_)
        return e - COULOMB_CONST * jnp.pi / (2 * beta * beta * vol) * qt * qt

    e1 = float(jax.jit(recip1)(xj, qj, boxj))
    e2 = float(jax.jit(recip2)(xj, qj, boxj))
    assert abs(e1 - e2) / abs(e1) < 1e-10, (e1, e2)

    g1 = jax.jit(jax.grad(recip1))(xj, qj, boxj)
    g2 = jax.jit(jax.grad(recip2))(xj, qj, boxj)
    err = float(jnp.max(jnp.abs(g1 - g2))) / float(jnp.max(jnp.abs(g1)))
    assert err < 1e-9, err
