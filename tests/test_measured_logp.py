"""Measured-data therapeutic target (VERDICT round-2 item 8): the
logp_experimental model trains on EMBEDDED literature octanol/water logP
values, so its labels are measurements the featurizer does not compute."""
import numpy as np

from molchanica_tpu.therapeutic.data import load_csv_dataset
from molchanica_tpu.therapeutic.infer import TherapeuticPredictor
from molchanica_tpu.therapeutic.targets import EXPERIMENTAL_DATA, TARGETS


def test_dataset_loads():
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "molchanica_tpu", "therapeutic",
                        EXPERIMENTAL_DATA["logp_experimental"])
    smiles, y = load_csv_dataset(path)
    assert len(smiles) >= 90 and len(y) == len(smiles)
    assert y.min() < -1.5 and y.max() > 5.0     # spans real logP range
    assert "logp_experimental" in TARGETS


def test_committed_weights_predict_sensibly():
    p = TherapeuticPredictor("logp_experimental")
    preds = p.predict(["CCO",                    # ethanol, exp -0.31
                       "Cc1ccccc1",              # toluene, exp 2.73
                       "c1ccc2ccccc2c1"])        # naphthalene, exp 3.30
    assert np.isfinite(preds).all()
    # ordering and coarse magnitude: measured-trained model must separate
    # a polar alcohol from aromatic hydrocarbons
    assert preds[0] < 1.0
    assert preds[1] > 1.2 and preds[2] > 1.8
    assert preds[0] < preds[1] < preds[2] + 1.0
