"""ADME GNN+MLP model: learns a synthetic structure-derived target."""
import numpy as np
import pytest

from molchanica_tpu.models.adme import (
    AdmeModelConfig,
    featurize_mol,
    predict_adme,
    train_adme,
)
from molchanica_tpu.models.eval import auroc, evaluate, pearson, scaffold_split
from molchanica_tpu.molecules.smiles import from_smiles

SMILES_POOL = [
    "CCO", "CCCO", "CCCCO", "CC(C)O", "CCOC", "CCOCC", "CC(=O)C",
    "CC(=O)O", "CCC(=O)O", "CC(=O)OC", "CCN", "CCCN", "CC(C)N",
    "CCNCC", "c1ccccc1", "Cc1ccccc1", "CCc1ccccc1", "Oc1ccccc1",
    "Nc1ccccc1", "Clc1ccccc1", "c1ccncc1", "Cc1ccncc1",
    "CC(=O)Nc1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "CCCCCC", "CCCCCCCC",
    "CC(C)CC(C)C", "OCC(O)CO", "NCCO", "OCCOCCO", "CSC", "CCSCC",
    "CC#N", "CCC#N", "FC(F)(F)c1ccccc1", "CCBr", "CCCl", "CCI",
    "CN(C)C", "CCN(CC)CC",
]


@pytest.fixture(scope="module")
def dataset():
    mols = [from_smiles(s) for s in SMILES_POOL]
    from molchanica_tpu.molecules.characterization import characterize
    # synthetic but structure-derived target: cLogP-like + size term
    y = np.asarray([characterize(m).clogp + 0.05 * m.n_atoms
                    for m in mols], np.float32)
    return mols, y


def test_featurization_shapes(dataset):
    mols, _ = dataset
    nodes, adj, mask, desc, cnodes, cadj, cmask = featurize_mol(mols[0])
    assert nodes.shape == (64, 16)
    assert adj.shape == (4, 64, 64)
    assert mask.sum() == mols[0].n_atoms
    assert np.isfinite(desc).all()
    # component-graph branch (reference gnn/component.rs)
    assert cnodes.shape[0] == cadj.shape[0] == cmask.shape[0]
    assert cmask.sum() >= 1      # at least one component
    assert (cadj == cadj.T).all()


@pytest.mark.heavy
def test_model_learns_regression(dataset):
    mols, y = dataset
    params, scaler, hist = train_adme(
        mols, y, cfg=AdmeModelConfig(hidden=32, n_message_passes=2,
                                     mlp_hidden=32),
        n_epochs=40, lr=4e-3, batch_size=16, seed=0)
    pred = predict_adme(params, mols, scaler,
                        cfg=AdmeModelConfig(hidden=32, n_message_passes=2,
                                            mlp_hidden=32))
    m = evaluate(y, pred)
    assert m["pearson"] > 0.85, m      # learns the structural signal
    assert hist[-1][2] < hist[0][2]    # val loss decreased


def test_metrics():
    y = np.asarray([0.0, 1.0, 2.0, 3.0])
    p = np.asarray([0.1, 0.9, 2.2, 2.9])
    m = evaluate(y, p)
    assert m["pearson"] > 0.99 and m["rmse"] < 0.2
    yb = np.asarray([0, 0, 1, 1])
    assert auroc(yb, np.asarray([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert abs(auroc(yb, np.asarray([0.9, 0.8, 0.2, 0.1]))) < 1e-9


def test_scaffold_split(dataset):
    mols, _ = dataset
    train, test = scaffold_split(mols, test_fraction=0.25, seed=1)
    assert len(train) + len(test) == len(mols)
    assert len(test) >= len(mols) // 5
    assert not set(train) & set(test)


def test_therapeutic_property_groups():
    """Grouped ADME/Toxicity orchestration (reference mod.rs:273-345):
    field mapping is complete and compute fills only trained targets."""
    from molchanica_tpu.therapeutic.infer import (
        _FIELD_MAP, Adme, TherapeuticProperties, Toxicity)

    # every mapped field exists on its group dataclass
    import dataclasses
    adme_fields = {f.name for f in dataclasses.fields(Adme)}
    tox_fields = {f.name for f in dataclasses.fields(Toxicity)}
    for tgt, (grp, fname) in _FIELD_MAP.items():
        assert fname in (adme_fields if grp == "adme" else tox_fields), \
            (tgt, grp, fname)

    p = TherapeuticProperties()
    d = p.as_dict()
    assert set(d) == {"adme", "toxicity"}
    assert np.isnan(d["adme"]["lipophilicity"])  # untrained stays NaN
