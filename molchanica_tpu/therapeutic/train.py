"""Training orchestration for therapeutic targets.

Reference parity: train.rs:1914 (per-target training driver: dataset ->
features -> Adam+cosine -> metrics -> embedded weight export).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from ..models.adme import AdmeModelConfig, predict_adme, train_adme
from ..models.eval import evaluate
from .data import builtin_smiles, load_csv_dataset, split_dataset
from .targets import TARGETS, TargetSpec, compute_labels

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "weights")


def _mols_from_smiles(smiles: List[str]):
    from ..molecules.smiles import from_smiles

    mols, keep = [], []
    for i, smi in enumerate(smiles):
        try:
            mols.append(from_smiles(smi))
            keep.append(i)
        except Exception:
            continue
    return mols, keep


def train_target(name: str, csv: Optional[str] = None,
                 n_epochs: int = 50, seed: int = 0,
                 save: bool = True, n_mols: int = 640) -> Dict:
    """Train one target end-to-end; returns {metrics, weights_path}.

    With csv=None the built-in generated dataset + computed labels are
    used (see therapeutic/data.py); point csv at a TDC download for
    measured labels.
    """
    spec = TARGETS[name]
    if csv is None:
        # measured-data targets ship their dataset with the package
        from .targets import EXPERIMENTAL_DATA
        if name in EXPERIMENTAL_DATA:
            csv = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               EXPERIMENTAL_DATA[name])
    if csv is not None:
        smiles, y = load_csv_dataset(csv)
        mols, keep = _mols_from_smiles(smiles)
        y = y[keep]
    else:
        smiles = builtin_smiles(n_mols)
        mols, _ = _mols_from_smiles(smiles)
        y = compute_labels(spec, mols)

    tr, va, te = split_dataset(len(mols), seed=seed)
    cfg = AdmeModelConfig(classification=spec.classification)
    params, scaler, history = train_adme(
        [mols[i] for i in tr] + [mols[i] for i in va],
        np.concatenate([y[tr], y[va]]),
        cfg=cfg, n_epochs=n_epochs, seed=seed,
        val_fraction=len(va) / max(len(tr) + len(va), 1))

    pred_te = predict_adme(params, [mols[i] for i in te], scaler, cfg)
    metrics = evaluate(y[te], np.asarray(pred_te),
                       classification=spec.classification)

    out = {"target": name, "metrics": metrics, "n_train": len(tr),
           "n_test": len(te), "history_tail": history[-3:]}
    if save:
        os.makedirs(WEIGHTS_DIR, exist_ok=True)
        path = os.path.join(WEIGHTS_DIR, f"{name}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"params": params, "scaler": scaler,
                         "cfg": cfg, "metrics": metrics,
                         "target": name}, f)
        out["weights_path"] = path
    return out


def train_all(names=None, **kw) -> Dict[str, Dict]:
    """Train every registered target (reference trains all 24 TDC tasks)."""
    results = {}
    for name in (names or TARGETS):
        results[name] = train_target(name, **kw)
    return results
