"""Molecule databases: parquet-backed screening/property sets.

Reference parity: the `mol_db` parquet molecule databases (SURVEY §2.3) —
bulk molecule storage with computed descriptors, used by screening and
training. pandas/pyarrow-backed; SMILES is the canonical structure column
and descriptors are computed by molecules/characterization on ingest.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable, List, Optional

import numpy as np
import pandas as pd

DESCRIPTOR_COLS = ["mol_weight", "tpsa", "clogp", "n_rings",
                   "n_aromatic_rings", "n_rotatable", "hbd", "hba",
                   "n_heavy"]


def _descriptor_row(smiles: str) -> Optional[dict]:
    from .molecules.characterization import characterize
    from .molecules.smiles import from_smiles

    try:
        mol = from_smiles(smiles)
        ch = characterize(mol)
    except Exception:
        return None
    return {
        "smiles": smiles,
        "mol_weight": ch.mol_weight, "tpsa": ch.tpsa, "clogp": ch.clogp,
        "n_rings": len(ch.rings), "n_aromatic_rings": ch.n_aromatic_rings,
        "n_rotatable": len(ch.rotatable_bonds),
        "hbd": ch.h_bond_donors, "hba": ch.h_bond_acceptors,
        "n_heavy": ch.n_heavy,
    }


@dataclass
class MolDb:
    """A molecule table (one row per molecule) with descriptors."""
    df: pd.DataFrame

    @staticmethod
    def from_smiles(smiles: Iterable[str], names: Optional[List[str]] = None
                    ) -> "MolDb":
        rows = []
        for i, smi in enumerate(smiles):
            r = _descriptor_row(smi)
            if r is None:
                continue
            if names is not None:
                r["name"] = names[i]
            rows.append(r)
        return MolDb(pd.DataFrame(rows))

    @staticmethod
    def open(path) -> "MolDb":
        return MolDb(pd.read_parquet(path))

    def save(self, path):
        self.df.to_parquet(path, index=False)
        return path

    def __len__(self):
        return len(self.df)

    # ---- query surface ----
    def filter_druglike(self, max_mw: float = 500.0, max_clogp: float = 5.0,
                        max_hbd: int = 5, max_hba: int = 10) -> "MolDb":
        """Lipinski filter."""
        d = self.df
        return MolDb(d[(d.mol_weight <= max_mw) & (d.clogp <= max_clogp)
                       & (d.hbd <= max_hbd) & (d.hba <= max_hba)]
                     .reset_index(drop=True))

    def query(self, expr: str) -> "MolDb":
        return MolDb(self.df.query(expr).reset_index(drop=True))

    def nearest(self, smiles: str, k: int = 10) -> pd.DataFrame:
        """Descriptor-space nearest neighbours (normalized Euclidean)."""
        probe = _descriptor_row(smiles)
        if probe is None:
            raise ValueError(f"unparseable SMILES: {smiles}")
        X = self.df[DESCRIPTOR_COLS].to_numpy(float)
        mu, sd = X.mean(0), X.std(0) + 1e-9
        q = (np.asarray([probe[c] for c in DESCRIPTOR_COLS]) - mu) / sd
        d = np.linalg.norm((X - mu) / sd - q, axis=1)
        idx = np.argsort(d)[:k]
        out = self.df.iloc[idx].copy()
        out["distance"] = d[idx]
        return out

    def molecules(self, limit: Optional[int] = None):
        """Materialize MoleculeCommon objects (lazy by row)."""
        from .molecules.smiles import from_smiles

        for smi in self.df.smiles[:limit]:
            yield from_smiles(smi)


# ---------------------------------------------------------------------
_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
EMBEDDED_DBS = ("metabolites_hmdb_core", "compounds_chebi_core")


def load_embedded_dbs() -> dict:
    """The embedded molecule databases shipped with the package — the
    analog of the reference's embedded HMDB + ChEBI parquet DBs loaded at
    startup (/root/reference/src/state.rs:88-104). Keys: EMBEDDED_DBS;
    values: MolDb (metabolites with names + descriptor columns).
    Regenerate with scripts/make_embedded_dbs.py."""
    out = {}
    for name in EMBEDDED_DBS:
        path = os.path.join(_DATA_DIR, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = MolDb.open(path)
    return out


def lookup_by_name(name: str, dbs: Optional[dict] = None):
    """Case-insensitive name lookup across the embedded DBs; returns a
    (db_name, row) pair or None."""
    dbs = dbs if dbs is not None else load_embedded_dbs()
    for db_name, db in dbs.items():
        if "name" not in db.df.columns:
            continue
        hit = db.df[db.df.name.str.lower() == name.lower()]
        if len(hit):
            return db_name, hit.iloc[0]
    return None
