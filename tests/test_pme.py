"""SPME validation: Madelung constant and spline-vs-exact reciprocal sums.

SURVEY.md §7 stage-6 exit criterion: "Coulomb energy vs analytic
Madelung/reference sums".
"""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erfc

from molchanica_tpu.constants import COULOMB_CONST
from molchanica_tpu.md.config import MdConfig
from molchanica_tpu.ops.pme import (
    default_grid,
    ewald_beta_for,
    make_pme_recip_fn,
)
from molchanica_tpu.topology import make_topology

MADELUNG_NACL = 1.7475645946


def _nacl_lattice(n_cells=4, a=1.0):
    """Simple-cubic alternating +-1 lattice (NaCl structure), d_nn = a."""
    idx = np.arange(n_cells)
    i, j, k = np.meshgrid(idx, idx, idx, indexing="ij")
    pos = np.stack([i, j, k], -1).reshape(-1, 3).astype(np.float64) * a
    q = ((i + j + k) % 2 * 2 - 1).reshape(-1).astype(np.float64)
    box = np.array([n_cells * a] * 3)
    return pos, q, box


def _direct_erfc_sum(pos, q, box, beta, rc):
    """Dense minimum-image erfc sum (f64 reference)."""
    d = pos[:, None, :] - pos[None, :, :]
    d -= box * np.round(d / box)
    r = np.sqrt((d * d).sum(-1))
    np.fill_diagonal(r, np.inf)
    e = COULOMB_CONST * q[:, None] * q[None, :] * erfc(beta * r) / r
    e[r > rc] = 0.0
    return 0.5 * e.sum()


def test_madelung_energy():
    pos, q, box = _nacl_lattice(4, 1.0)
    n = len(q)
    rc = 1.9
    rtol = 1e-7
    beta = ewald_beta_for(rc, rtol)
    cfg = MdConfig(coulomb_cutoff=rc, ewald_rtol=rtol, dtype="float64",
                   pme_grid=(32, 32, 32))
    top = make_topology(
        np.ones(n), q, np.ones(n), np.zeros(n), dtype=jnp.float64)
    recip_fn = make_pme_recip_fn(top, cfg, box)
    e_recip = float(recip_fn(jnp.asarray(pos), jnp.asarray(box),
                             jnp.asarray(1.0)))
    e_direct = _direct_erfc_sum(pos, q, box, beta, rc)
    e_self = -beta / np.sqrt(np.pi) * COULOMB_CONST * np.sum(q * q)
    e_total = e_direct + e_recip + e_self
    e_exact = -0.5 * n * MADELUNG_NACL * COULOMB_CONST  # d = 1 A, |q| = 1
    np.testing.assert_allclose(e_total, e_exact, rtol=2e-5)


def test_pme_matches_exact_recip_random():
    """Spline-interpolated structure factors vs exact plane-wave sum."""
    rng = np.random.default_rng(4)
    n = 40
    box = np.array([12.0, 10.0, 15.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n)
    q -= q.mean()
    rc = 4.5
    beta = ewald_beta_for(rc, 1e-6)
    cfg = MdConfig(coulomb_cutoff=rc, ewald_rtol=1e-6, dtype="float64",
                   pme_grid=(36, 32, 45))
    top = make_topology(np.ones(n), q, np.ones(n), np.zeros(n),
                        dtype=jnp.float64)
    recip_fn = make_pme_recip_fn(top, cfg, box)
    e_pme = float(recip_fn(jnp.asarray(pos), jnp.asarray(box),
                           jnp.asarray(1.0)))

    # exact reciprocal sum over the same k-lattice
    mmax = 12
    e_exact = 0.0
    vol = box.prod()
    for mx in range(-mmax, mmax + 1):
        for my in range(-mmax, mmax + 1):
            for mz in range(-mmax, mmax + 1):
                if mx == my == mz == 0:
                    continue
                kvec = 2 * np.pi * np.array([mx, my, mz]) / box
                k2 = (kvec * kvec).sum()
                s = (q * np.exp(1j * pos @ kvec)).sum()
                e_exact += (4 * np.pi / k2 * np.exp(-k2 / (4 * beta**2))
                            * abs(s) ** 2)
    e_exact *= COULOMB_CONST / (2 * vol)
    # order-4 B-spline interpolation accuracy at this grid spacing is ~1e-4
    np.testing.assert_allclose(e_pme, e_exact, rtol=4e-4)


@pytest.mark.heavy
def test_recip_force_matches_numeric_gradient():
    import jax
    rng = np.random.default_rng(7)
    n = 16
    box = np.array([10.0, 10.0, 10.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n); q -= q.mean()
    cfg = MdConfig(coulomb_cutoff=4.0, dtype="float64", pme_grid=(24, 24, 24))
    top = make_topology(np.ones(n), q, np.ones(n), np.zeros(n),
                        dtype=jnp.float64)
    recip_fn = make_pme_recip_fn(top, cfg, box)
    f = lambda x: recip_fn(x, jnp.asarray(box), jnp.asarray(1.0))
    g = jax.grad(f)(jnp.asarray(pos))
    h = 1e-5
    for _ in range(6):
        i, d = rng.integers(0, n), rng.integers(0, 3)
        xp = pos.copy(); xp[i, d] += h
        xm = pos.copy(); xm[i, d] -= h
        num = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * h)
        np.testing.assert_allclose(float(g[i, d]), num, rtol=1e-4, atol=1e-6)
