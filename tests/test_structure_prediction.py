"""Structure prediction: baseline folder + registry-gated backends.

Reference: src/structure_prediction/mod.rs (shared dispatch over Boltz-2 /
OpenDDE / ESMFold through the external-tools registry)."""
import numpy as np
import pytest

from molchanica_tpu.structure_prediction import (
    MODELS, assign_secondary_structure, available_models,
    predict_structure)


def test_secondary_structure_propensities():
    # poly-alanine/glutamate: strong helix formers
    ss_helix = assign_secondary_structure("AEAEAEAEAEAEAEAE")
    assert ss_helix.count("H") > len(ss_helix) * 0.6
    # poly-valine/isoleucine: strong sheet formers
    ss_sheet = assign_secondary_structure("VIVIVIVIVIVIVIVI")
    assert ss_sheet.count("E") > len(ss_sheet) * 0.6
    # glycine/proline rich: coil
    ss_coil = assign_secondary_structure("GPGGPGGPGGPG")
    assert ss_coil.count("C") > len(ss_coil) * 0.6


def test_baseline_prediction_builds_real_geometry():
    seq = "AEAEAEAEAEAE"
    mol = predict_structure(seq, model="baseline")
    assert mol.n_atoms > 5 * len(seq)          # heavy atoms incl. sidechains
    x = np.asarray(mol.positions)
    assert np.isfinite(x).all()
    # helical dihedrals curl the chain: end-to-end distance must be well
    # below the extended-chain contour length (~3.5 A per residue)
    ca = np.array([x[i] for i, nm in enumerate(mol.atom_names)
                   if nm == "CA"])
    e2e = np.linalg.norm(ca[-1] - ca[0])
    assert e2e < 3.0 * len(seq)
    # helix rise ~1.5 A/residue: consecutive CA spacing stays bonded-range
    d = np.linalg.norm(np.diff(ca, axis=0), axis=1)
    assert (d > 2.0).all() and (d < 4.5).all()
    assert mol.metadata["predictor"] == "baseline"


def test_baseline_differs_from_extended():
    from molchanica_tpu.molecules.peptide_builder import build_peptide
    seq = "AEAEAEAEAEAE"
    helix = predict_structure(seq, model="baseline")
    ext = build_peptide(seq)
    ca_h = np.array([helix.positions[i]
                     for i, nm in enumerate(helix.atom_names) if nm == "CA"])
    ca_e = np.array([ext.positions[i]
                     for i, nm in enumerate(ext.atom_names) if nm == "CA"])
    # helix is much more compact than the extended build
    assert np.linalg.norm(ca_h[-1] - ca_h[0]) \
        < 0.7 * np.linalg.norm(ca_e[-1] - ca_e[0])


def test_dispatch_and_gating():
    assert available_models()[-1] == "baseline"
    with pytest.raises(ValueError):
        predict_structure("AAA", model="alphafold99")
    # uninstalled backend raises a clean, named error (never a crash)
    import molchanica_tpu.external_tools as tools
    if not tools.probe("boltz2").available:
        with pytest.raises(Exception) as e:
            predict_structure("AAA", model="boltz2")
        assert "boltz" in str(e.value).lower()
    assert set(MODELS) == {"boltz2", "opendde", "esmfold", "baseline"}


def test_baseline_predicts_minimizable_structure():
    """The predicted structure must feed the MD pipeline (prepare -> top)."""
    from molchanica_tpu.molecules.peptide import prepare_peptide
    from molchanica_tpu.molecules.spec import assemble_system

    mol = predict_structure("AEAEAE", model="baseline")
    spec = prepare_peptide(mol)
    asys = assemble_system([spec])
    assert asys.topology.n_atoms_real >= mol.n_atoms
