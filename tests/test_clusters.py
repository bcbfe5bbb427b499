"""Cluster-pair backend vs the dense shift-window backend (and dense ref)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molchanica_tpu.md.config import MdConfig
from molchanica_tpu.ops.cells import make_xla_direct_force_fn
from molchanica_tpu.ops.clusters import (
    make_cluster_direct_force_fn,
    make_cluster_rebuild_fn,
    plan_clusters,
)
from molchanica_tpu.topology import make_topology


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(5)
    box = np.array([26.0, 24.0, 28.0])
    n = 700
    npad = 768
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(size=n) * 0.3
    q -= q.mean()
    sig = rng.uniform(2.5, 3.5, n)
    eps = rng.uniform(0.05, 0.3, n)
    top = make_topology(np.ones(n) * 12, q, sig, eps, pad_atoms_to=npad,
                        dtype=jnp.float64)
    x = np.full((npad, 3), 1e6)
    x[:n] = pos
    # a few atoms drifted outside the box (wrapping must be handled)
    x[:10] += box * np.array([2.0, -1.0, 0.0])
    return top, x, box


def test_clusters_match_window(system):
    top, x, box = system
    cfg = MdConfig(lj_cutoff=8.0, coulomb_cutoff=8.0, dtype="float64")
    beta = 0.35
    xj = jnp.asarray(x)
    bj = jnp.asarray(box)
    c1 = jnp.asarray(1.0)

    win = make_xla_direct_force_fn(top, cfg, box, x0=x)
    fw, elj_w, ec_w, _ = jax.jit(lambda x_: win(x_, bj, c1, beta))(xj)

    plan = plan_clusters(box, 8.0, top.n_atoms_real, top.n_atoms)
    rebuild = make_cluster_rebuild_fn(plan, top)
    order, nbr, ovf = jax.jit(rebuild)(xj, bj)
    assert int(ovf) == 0
    clus = make_cluster_direct_force_fn(top, cfg, plan)
    fc, elj_c, ec_c = jax.jit(
        lambda x_, o_, n_: clus(x_, bj, c1, beta, o_, n_)[:3])(xj, order, nbr)

    np.testing.assert_allclose(float(elj_c), float(elj_w), rtol=1e-8)
    np.testing.assert_allclose(float(ec_c), float(ec_w), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fw),
                               rtol=1e-6, atol=1e-7)


def test_cluster_list_skin_survives_motion(system):
    """The pair list built with skin must stay valid for small displacements."""
    top, x, box = system
    cfg = MdConfig(lj_cutoff=8.0, coulomb_cutoff=8.0, dtype="float64")
    beta = 0.35
    bj = jnp.asarray(box)
    c1 = jnp.asarray(1.0)
    plan = plan_clusters(box, 8.0, top.n_atoms_real, top.n_atoms)
    rebuild = make_cluster_rebuild_fn(plan, top)
    clus = make_cluster_direct_force_fn(top, cfg, plan)
    order, nbr, _ = jax.jit(rebuild)(jnp.asarray(x), bj)
    # move atoms by < skin/2 each: stale list must still capture all pairs
    rng = np.random.default_rng(1)
    x2 = x + rng.normal(0, 0.08, x.shape).clip(-0.25, 0.25)
    x2j = jnp.asarray(x2)
    _, elj_stale, ec_stale = jax.jit(
        lambda x_, o_, n_: clus(x_, bj, c1, beta, o_, n_)[:3])(x2j, order, nbr)
    win = make_xla_direct_force_fn(top, cfg, box, x0=x2)
    _, elj_ref, ec_ref, _ = jax.jit(lambda x_: win(x_, bj, c1, beta))(x2j)
    np.testing.assert_allclose(float(elj_stale), float(elj_ref), rtol=1e-7)
    np.testing.assert_allclose(float(ec_stale), float(ec_ref), rtol=1e-7)
