"""File IO: molecular structure + trajectory formats.

Coverage mirrors the reference's `src/file_io` (open/save mmCIF, PDB, SDF,
Mol2, XYZ, GRO, DCD trajectories — src/file_io/mod.rs:114+).
"""
from .sdf import read_sdf, write_sdf            # noqa: F401
from .mol2 import read_mol2, write_mol2         # noqa: F401
from .pdb import read_pdb, write_pdb            # noqa: F401
from .xyz import read_xyz, write_xyz            # noqa: F401
from .gro import read_gro, write_gro            # noqa: F401
from .dcd import read_dcd, write_dcd            # noqa: F401


def open_file(path):
    """Format-dispatched open (reference State::open_file analog)."""
    p = str(path).lower()
    if p.endswith((".sdf", ".mol", ".mdl")):
        return read_sdf(path)
    if p.endswith(".mol2"):
        return read_mol2(path)
    if p.endswith((".pdb", ".ent")):
        return read_pdb(path)
    if p.endswith(".xyz"):
        return read_xyz(path)
    if p.endswith(".gro"):
        return read_gro(path)
    if p.endswith(".cif") or p.endswith(".mmcif"):
        from .mmcif import read_mmcif
        return read_mmcif(path)
    raise ValueError(f"unrecognized structure format: {path}")
