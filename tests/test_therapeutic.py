"""Therapeutic ML pipeline: dataset -> training -> saved weights ->
embedded inference (reference train.rs:1914 / infer.rs:53)."""
import numpy as np
import pytest

from molchanica_tpu.therapeutic import TARGETS, TherapeuticPredictor
from molchanica_tpu.therapeutic.data import builtin_smiles, split_dataset
from molchanica_tpu.therapeutic.train import train_target


def test_registry_covers_reg_and_cls():
    kinds = {s.classification for s in TARGETS.values()}
    assert kinds == {True, False}
    assert len(TARGETS) >= 8


@pytest.mark.heavy
def test_builtin_dataset_valid_and_deterministic():
    a = builtin_smiles(200)
    b = builtin_smiles(200)
    assert a == b
    assert len(a) == 200
    assert len(set(a)) == 200


def test_split_disjoint():
    tr, va, te = split_dataset(100, seed=1)
    assert len(set(tr) | set(va) | set(te)) == 100
    assert not (set(tr) & set(te)) and not (set(va) & set(te))


@pytest.mark.heavy
def test_train_and_infer_regression(tmp_path):
    """Small end-to-end run must beat the mean-predictor baseline on the
    held-out test set (proves real learning, not plumbing)."""
    res = train_target("lipophilicity_astrazeneca", n_epochs=12,
                       n_mols=160, save=True, seed=1)
    m = res["metrics"]
    assert m["pearson"] > 0.6, m
    pred = TherapeuticPredictor("lipophilicity_astrazeneca")
    out = pred.predict(["CCO", "c1ccccc1CCCC"])
    assert out.shape == (2,)
    assert out[1] > out[0]          # butylbenzene more lipophilic
    # determinism
    out2 = pred.predict(["CCO", "c1ccccc1CCCC"])
    np.testing.assert_allclose(out, out2)


@pytest.mark.heavy
def test_classification_target():
    res = train_target("hia_hou", n_epochs=12, n_mols=160, save=False,
                       seed=2)
    m = res["metrics"]
    assert "auroc" in m and 0.0 <= m["auroc"] <= 1.0


def test_predictor_missing_weights():
    with pytest.raises(FileNotFoundError):
        TherapeuticPredictor("no_such_target_xyz")
