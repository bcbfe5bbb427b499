"""Crystal, shrinking-box, boundary-layer, mixing workloads
(reference properties/{crystal,sol_shrinking_box,water_sol_mix,
mixing_analysis}.rs)."""
import numpy as np
import pytest

from molchanica_tpu.molecules.spec import MolSpec
from molchanica_tpu.properties.mixing import mixing_diagnostics


def _small_mol():
    """Methanol-like rigid-ish solute."""
    return MolSpec(
        masses=[12.011, 1.008, 1.008, 1.008, 15.999, 1.008],
        charges=[0.12, 0.04, 0.04, 0.04, -0.60, 0.36],
        lj_sigma=[3.4, 2.47, 2.47, 2.47, 3.07, 0.0],
        lj_eps=[0.11, 0.016, 0.016, 0.016, 0.21, 0.0],
        positions=np.array([[0.0, 0, 0], [0.36, 1.03, 0],
                            [0.36, -0.51, 0.89], [0.36, -0.51, -0.89],
                            [-1.41, 0, 0], [-1.74, -0.9, 0]]),
        bonds=[(0, 1, 340.0, 1.09), (0, 2, 340.0, 1.09),
               (0, 3, 340.0, 1.09), (0, 4, 320.0, 1.41),
               (4, 5, 553.0, 0.96)],
        angles=[(1, 0, 2, 35.0, 1.911), (1, 0, 3, 35.0, 1.911),
                (2, 0, 3, 35.0, 1.911), (1, 0, 4, 50.0, 1.911),
                (2, 0, 4, 50.0, 1.911), (3, 0, 4, 50.0, 1.911),
                (0, 4, 5, 55.0, 1.894)],
        hclusters=[(0, [1, 2, 3], [1.09] * 3), (4, [5], [0.96])])


def test_mixing_discriminates():
    rng = np.random.default_rng(0)
    box = np.array([30.0] * 3)
    water = rng.uniform(0, 30, (400, 3))
    mixed = mixing_diagnostics(rng.uniform(0, 30, (8, 3)), water, box)
    clump = np.array([15.0, 15, 15]) + rng.normal(0, 1.2, (8, 3))
    agg = mixing_diagnostics(clump, water, box)
    assert mixed.score > agg.score
    assert agg.largest_cluster_fraction > 0.9
    assert 0.0 <= mixed.score <= 1.0


def test_solubility_extremes_mixed_grid_vs_split_slab():
    """The reference's own extreme-case test design (mixing_analysis.rs
    compute_solubility_extremes_for_mixed_grid_and_split_slabs): an evenly
    mixed solute grid must score near the top of the scale, a solute slab
    phase-separated from a water slab near the bottom."""
    from molchanica_tpu.properties.mixing import (
        compute_solubility, map_to_aqsoldb, valid_solubility_cell)

    rng = np.random.default_rng(2)
    box = np.array([32.0] * 3)
    n_per = 3                                 # 3-atom rigid solute copies
    offs = rng.normal(0, 0.5, (n_per, 3))

    # evenly mixed: 27 copies on a 3x3x3 grid, water uniform
    grid = np.stack(np.meshgrid(*[np.linspace(4, 28, 3)] * 3),
                    -1).reshape(-1, 3)
    mixed_solute = (grid[:, None] + offs[None]).reshape(-1, 3)
    water_uniform = rng.uniform(0, 32, (900, 3))
    s_mixed = compute_solubility(mixed_solute, n_per, water_uniform, box)

    # phase-separated: solute slab z<8, water slab z>16
    slab_xy = rng.uniform(0, 32, (27, 2))
    slab_z = rng.uniform(2, 6, (27, 1))
    slab = np.concatenate([slab_xy, slab_z], axis=1)
    sep_solute = (slab[:, None] + offs[None]).reshape(-1, 3)
    water_slab = np.concatenate([rng.uniform(0, 32, (900, 2)),
                                 rng.uniform(16, 32, (900, 1))], axis=1)
    s_sep = compute_solubility(sep_solute, n_per, water_slab, box)

    assert s_mixed > 0.6, s_mixed
    assert s_sep < 0.45, s_sep
    assert s_mixed > s_sep + 0.3
    # AqSolDB mapping is monotone over the unit interval
    assert map_to_aqsoldb(s_mixed) > map_to_aqsoldb(s_sep)
    assert map_to_aqsoldb(0.0) == -4.0 and map_to_aqsoldb(1.0) == 2.0
    assert not valid_solubility_cell(None)
    assert valid_solubility_cell(box)


def test_solubility_helpers():
    from molchanica_tpu.properties.mixing import (
        adapted_kernel_sigmas, log_expanded_score, occupancy_count_score,
        solute_mol_centers)

    # periodic COM: molecule straddling the boundary lands near the edge,
    # not in the cell middle
    box = np.array([20.0] * 3)
    mol = np.array([[19.5, 10, 10], [0.5, 10, 10]])
    com = solute_mol_centers(mol, 2, box)
    assert min(com[0, 0], 20.0 - com[0, 0]) < 1.0, com

    # occupancy saturates at/above the expectation, 0 when empty
    assert occupancy_count_score(0, 10.0) == 0.0
    assert occupancy_count_score(10, 10.0) > 0.95
    assert occupancy_count_score(100, 10.0) == 1.0

    # log expansion: monotone, endpoints fixed, expands low scores
    assert log_expanded_score(0.0) == 0.0
    assert abs(log_expanded_score(1.0) - 1.0) < 1e-12
    assert log_expanded_score(0.1) > 0.1

    # sigmas clamp to small cells
    sig_small = adapted_kernel_sigmas(np.array([8.0] * 3))
    assert max(sig_small) <= 0.9 * 4.0 + 1e-9


def test_graph_ml_features():
    from molchanica_tpu.models.graph_ml import (
        atom_graph_analysis_features, graphlet_size_3_features, wl_kernel)
    from molchanica_tpu.molecules.smiles import from_smiles

    benzene = from_smiles("c1ccccc1")
    hexane = from_smiles("CCCCCC")
    f1 = atom_graph_analysis_features(benzene)
    f2 = atom_graph_analysis_features(hexane)
    assert f1.shape == f2.shape and np.isfinite(f1).all()
    assert not np.allclose(f1, f2)
    # WL kernel: self-similarity 1, benzene vs hexane < 1
    k_self = wl_kernel(benzene.adjacency(), benzene.elements,
                       benzene.adjacency(), benzene.elements)
    k_cross = wl_kernel(benzene.adjacency(), benzene.elements,
                        hexane.adjacency(), hexane.elements)
    np.testing.assert_allclose(k_self, 1.0, atol=1e-12)
    assert k_cross < 0.9
    # triangle counting
    tri_adj = [[1, 2], [0, 2], [0, 1]]
    g = graphlet_size_3_features(tri_adj)
    assert g[0] == 1.0      # one triangle over one possible triple


@pytest.mark.slow
def test_crystal_sim_small():
    from molchanica_tpu.properties.crystal import run_crystal_sim

    data, _snaps = run_crystal_sim(
        _small_mol(), requested_copies=8, n_steps=200, dt_ps=0.001,
        cfg_overrides=dict(max_init_relaxation_iters=150))
    assert np.isfinite(data.cohesive_energy_kcal_per_mol)
    assert data.copy_count >= 4
    # condensed phase of a polar molecule must be cohesive (negative)
    assert data.cohesive_energy_kcal_per_mol < 5.0


@pytest.mark.slow
def test_shrinking_box_reaches_density():
    from molchanica_tpu.properties.shrinking_box import (
        run_shrinking_box_sim)

    mols = [_small_mol() for _ in range(10)]
    data = run_shrinking_box_sim(
        mols, target_density_g_cm3=0.7, steps_per_stage=60,
        cfg_overrides=dict(max_init_relaxation_iters=100))
    assert data.final_density_g_cm3 > 0.6
    assert np.isfinite(data.temperature_k)
    assert data.shrink_steps > 0


@pytest.mark.heavy
def test_shrinking_box_slab_mode_and_batch():
    """Layer/slab start mode + the batch runner (reference
    sol_shrinking_box.rs:85-104 slab modes, :1699 run_on_select_mols)."""
    from molchanica_tpu.properties.shrinking_box import (
        pack_to_density, run_on_select_mols, run_shrinking_box_sim)

    mols = [_small_mol() for _ in range(8)]
    data = run_shrinking_box_sim(
        mols, target_density_g_cm3=0.55, steps_per_stage=40, mode="slab",
        solute_indices=[0, 1, 2, 3],
        cfg_overrides=dict(max_init_relaxation_iters=80))
    assert data.final_density_g_cm3 > 0.45
    assert data.mixing is not None       # solute/solvent split produced

    runs = run_on_select_mols(
        [[_small_mol() for _ in range(4)]], target_density_g_cm3=0.5,
        steps_per_stage=30,
        cfg_overrides=dict(max_init_relaxation_iters=60))
    assert len(runs) == 1 and runs[0].shrink_steps >= 0

    x, box = pack_to_density(
        [_small_mol() for _ in range(4)], target_density_g_cm3=0.5,
        steps_per_stage=30,
        cfg_overrides=dict(max_init_relaxation_iters=60))
    assert x.shape[1] == 3 and box.shape == (3,)


@pytest.mark.slow
def test_boundary_layer_profile():
    from molchanica_tpu.properties.boundary_layer import (
        run_boundary_layer_sol_sim)

    data = run_boundary_layer_sol_sim(
        _small_mol(), slab_waters=80, box_xy=14.0, box_z=40.0,
        n_steps=450, cfg_overrides=dict(max_init_relaxation_iters=100,
                                        lj_cutoff=6.5, coulomb_cutoff=6.5))
    prof = data.density_profile
    assert prof is not None and prof.sum() > 0
    # slab: dense bottom half, empty top
    nb = len(prof)
    assert prof[: nb // 3].sum() > 3 * prof[-nb // 4:].sum()
    assert 0.0 <= data.surface_affinity <= 1.0
