"""Embedded-weights inference (reference infer.rs:53 — sub-ms batched
prediction from weights shipped inside the binary/package)."""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from .train import WEIGHTS_DIR


class TherapeuticPredictor:
    """Loads a trained target model and predicts from SMILES/molecules.

    After the first call the whole path is one jitted batched apply —
    per-molecule featurization is host-side numpy, the network is a single
    device program (vmapped by construction).
    """

    def __init__(self, target: str, weights_path: Optional[str] = None):
        path = weights_path or os.path.join(WEIGHTS_DIR, f"{target}.pkl")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no trained weights for {target!r} at {path}; run "
                "molchanica_tpu.therapeutic.train_target first")
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.target = blob["target"]
        self.params = blob["params"]
        self.scaler = blob["scaler"]
        self.cfg = blob["cfg"]
        self.metrics: Dict[str, float] = blob.get("metrics", {})

    def predict_mols(self, mols) -> np.ndarray:
        from ..models.adme import predict_adme

        return np.asarray(predict_adme(self.params, mols, self.scaler,
                                       self.cfg))

    def predict(self, smiles: Sequence[str]) -> np.ndarray:
        from ..molecules.smiles import from_smiles

        return self.predict_mols([from_smiles(s) for s in smiles])

    @staticmethod
    def available() -> List[str]:
        if not os.path.isdir(WEIGHTS_DIR):
            return []
        return sorted(p[:-4] for p in os.listdir(WEIGHTS_DIR)
                      if p.endswith(".pkl"))
