"""Gradient-consistency and per-term sanity checks for the energy assembly.

The analog of the reference's per-term validation hooks (MdOverrides ablation
switches, src/md/mod.rs:672-681) plus a numeric-vs-autodiff force check in the
spirit of `--verify-mpnn` golden testing (SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molchanica_tpu.md.config import MdConfig, MdOverrides
from molchanica_tpu.md.energy import make_energy_fn, make_force_fn
from molchanica_tpu.systems.testmols import build_ethanol, build_lj_dimer


@pytest.fixture(scope="module")
def ethanol():
    return build_ethanol(dtype=jnp.float64)


def test_energy_finite(ethanol):
    top, x0 = ethanol
    cfg = MdConfig()
    e_fn = make_energy_fn(top, cfg, method="allpairs")
    e, terms = e_fn(x0, None, jnp.asarray(1.0))
    assert np.isfinite(float(e))
    for k, v in terms.items():
        assert np.isfinite(float(v)), k


def test_term_breakdown_sums(ethanol):
    top, x0 = ethanol
    cfg = MdConfig()
    e_fn = make_energy_fn(top, cfg, method="allpairs")
    e, t = e_fn(x0, None, jnp.asarray(1.0))
    np.testing.assert_allclose(
        float(t["energy_potential"]),
        float(t["energy_potential_bonded"]) + float(t["energy_potential_nonbonded"]),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        float(t["energy_potential_bonded"]),
        float(t["bond"]) + float(t["angle"]) + float(t["dihedral"]),
        rtol=1e-12,
    )


@pytest.mark.heavy
def test_forces_match_numeric_gradient(ethanol):
    top, x0 = ethanol
    cfg = MdConfig()
    e_fn = make_energy_fn(top, cfg, method="allpairs")
    f_fn = make_force_fn(e_fn)
    f, (e, _) = f_fn(x0, None, jnp.asarray(1.0))
    f = np.asarray(f)

    h = 1e-6
    x_np = np.asarray(x0)
    rng = np.random.default_rng(0)
    for _ in range(12):
        i = rng.integers(0, 9)
        d = rng.integers(0, 3)
        xp = x_np.copy(); xp[i, d] += h
        xm = x_np.copy(); xm[i, d] -= h
        ep = float(e_fn(jnp.asarray(xp), None, jnp.asarray(1.0))[0])
        em = float(e_fn(jnp.asarray(xm), None, jnp.asarray(1.0))[0])
        f_num = -(ep - em) / (2 * h)
        np.testing.assert_allclose(f[i, d], f_num, rtol=2e-5, atol=1e-5)


def test_overrides_disable_terms(ethanol):
    top, x0 = ethanol
    c = jnp.asarray(1.0)
    base = make_energy_fn(top, MdConfig(), method="allpairs")(x0, None, c)[1]
    no_bonded = make_energy_fn(
        top, MdConfig(overrides=MdOverrides(bonded_disabled=True)),
        method="allpairs")(x0, None, c)[1]
    assert float(no_bonded["energy_potential_bonded"]) == 0.0
    np.testing.assert_allclose(
        float(no_bonded["energy_potential_nonbonded"]),
        float(base["energy_potential_nonbonded"]), rtol=1e-12)
    no_lj = make_energy_fn(
        top, MdConfig(overrides=MdOverrides(lj_disabled=True)),
        method="allpairs")(x0, None, c)[1]
    assert float(no_lj["lj"]) == 0.0
    no_coul = make_energy_fn(
        top, MdConfig(overrides=MdOverrides(coulomb_disabled=True)),
        method="allpairs")(x0, None, c)[1]
    assert float(no_coul["coulomb"]) == 0.0


@pytest.mark.heavy
def test_lj_dimer_minimum():
    """LJ pair: energy at r = 2^(1/6) sigma must equal -eps, force ~ 0."""
    sigma, eps = 3.4, 0.24
    top, _ = build_lj_dimer(sigma=sigma, eps=eps, dtype=jnp.float64)
    r_min = 2.0 ** (1.0 / 6.0) * sigma
    x = jnp.asarray([[0.0, 0.0, 0.0], [r_min, 0.0, 0.0]], jnp.float64)
    e_fn = make_energy_fn(top, MdConfig(), method="allpairs")
    e, _ = e_fn(x, None, jnp.asarray(1.0))
    np.testing.assert_allclose(float(e), -eps, rtol=1e-10)
    f, _ = make_force_fn(e_fn)(x, None, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-10)


def test_exclusions_remove_bonded_pairs(ethanol):
    """Bonded (1-2/1-3) atoms must not see LJ/Coulomb; 1-4 are scaled."""
    top, x0 = ethanol
    # count: ethanol has 8 bonds + 13 angles -> excl pairs; 1-4 pairs exist
    n_excl = int(np.sum(np.asarray(top.excl_mask)))
    n_14 = int(np.sum(np.asarray(top.pair14_mask)))
    assert n_excl == 8 + 13
    assert n_14 > 0


def test_padding_atoms_do_not_contribute():
    top_p, x_p = build_ethanol(dtype=jnp.float64, pad_atoms_to=64)
    top, x = build_ethanol(dtype=jnp.float64)
    c = jnp.asarray(1.0)
    e1 = float(make_energy_fn(top, MdConfig(), "allpairs")(x, None, c)[0])
    e2 = float(make_energy_fn(top_p, MdConfig(), "allpairs")(x_p, None, c)[0])
    np.testing.assert_allclose(e1, e2, rtol=1e-9)
