"""Structure-prediction drivers (reference src/structure_prediction/):
input generation + output discovery; execution is probe-gated (no tool
binaries in this environment)."""
import pytest

from molchanica_tpu.external.structure_prediction import (
    BOLTZ2, TOOLS, find_prediction_cif, make_boltz_yaml, make_fasta,
    normalize_sequence, predict_structure)


def test_sequence_normalization():
    assert normalize_sequence("acdefg") == "ACDEFG"
    assert normalize_sequence(["ALA", "GLY", "TRP"]) == "AGW"
    assert normalize_sequence(list("MKV")) == "MKV"
    with pytest.raises(ValueError):
        normalize_sequence("ACXZ1")


def test_input_generation():
    f = make_fasta("MKVA", name="q1")
    assert f == ">q1\nMKVA\n"
    y = make_boltz_yaml("MKVA", ligand_smiles="CCO")
    assert "version: 1" in y and "sequence: MKVA" in y
    assert "smiles: 'CCO'" in y
    y2 = make_boltz_yaml("MKVA")
    assert "ligand" not in y2


def test_output_discovery(tmp_path):
    assert find_prediction_cif(tmp_path) is None
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "model_0.cif").write_text("data_x\n")
    got = find_prediction_cif(tmp_path)
    assert got is not None and got.name == "model_0.cif"


def test_probe_gated_execution():
    if BOLTZ2.available:            # pragma: no cover (env-dependent)
        pytest.skip("boltz present; full run not exercised in unit tests")
    with pytest.raises(RuntimeError, match="executable not found"):
        predict_structure("MKVA", tool="boltz2")
    assert set(TOOLS) == {"boltz2", "esmfold"}
