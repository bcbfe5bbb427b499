"""External-tools registry, mol DB, component decomposition, GROMACS
log parsing."""
import numpy as np
import pytest

from molchanica_tpu.external_tools import (
    REGISTRY, ToolStatus, available_tools, probe, require)
from molchanica_tpu.mol_db import MolDb
from molchanica_tpu.molecules.components import component_summary, decompose
from molchanica_tpu.molecules.smiles import from_smiles


def test_registry_probe():
    assert "gromacs" in REGISTRY and "orca" in REGISTRY
    st = probe("gromacs")
    assert isinstance(st, ToolStatus)
    assert isinstance(available_tools(), list)


def test_require_missing_is_clear():
    if not probe("orca").available:
        with pytest.raises(RuntimeError, match="orca"):
            require("orca")


def test_components_ibuprofen_like():
    mol = from_smiles("CC(C)Cc1ccc(cc1)C(C)C(=O)O")
    comps = decompose(mol)
    s = component_summary(mol)
    assert s["n_ring_systems"] == 1
    assert s["n_components"] >= 3
    # the ring system's component contains 6 carbons of the ring
    ring = [c for c in comps if c.kind == "ring_system"][0]
    assert sum(1 for e in ring.elements if e == "C") >= 6
    # every atom appears exactly once
    all_atoms = sorted(i for c in comps for i in c.atom_indices)
    assert all_atoms == list(range(mol.n_atoms))


def test_components_biphenyl_split():
    mol = from_smiles("c1ccc(cc1)c1ccccc1")
    s = component_summary(mol)
    assert s["n_ring_systems"] == 2


def test_mol_db_roundtrip(tmp_path):
    smiles = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "CCCCCCCCCC",
              "OC(=O)c1ccccc1O"]
    db = MolDb.from_smiles(smiles)
    assert len(db) == 5
    p = str(tmp_path / "db.parquet")
    db.save(p)
    db2 = MolDb.open(p)
    assert len(db2) == 5
    assert "clogp" in db2.df.columns
    # druglike filter keeps everything small here
    assert len(db2.filter_druglike()) == 5
    nn = db2.nearest("CCO", k=2)
    assert nn.iloc[0].smiles == "CCO"
    mols = list(db2.molecules(limit=2))
    assert mols[0].n_atoms > 0


def test_gromacs_log_parse_multi():
    from molchanica_tpu.io.gromacs import parse_gromacs_log_energies
    log = """stuff
   Energies (kJ/mol)
           Bond          Angle      Potential
    1.00000e+00    2.00000e+00    3.00000e+00
more
   Energies (kJ/mol)
           Bond          Angle      Potential
    4.00000e+00    5.00000e+00    6.00000e+00
"""
    es = parse_gromacs_log_energies(log)
    assert len(es) == 2
    assert es[1]["Potential"] == 6.0


def test_sonification():
    """Bonds-as-oscillators audio (reference src/sonification.rs): light
    atoms / stiff bonds map to higher pitches; output is a valid WAV."""
    import wave

    import numpy as np

    from molchanica_tpu.molecules.smiles import from_smiles
    from molchanica_tpu.sonification import (bond_tones, sonify_to_file,
                                             synthesize)

    mol = from_smiles("CCO")
    tones = bond_tones(mol, include_h=True)
    assert len(tones) == len(mol.bonds)
    # O-H stretch is the highest physical frequency in ethanol
    el = [e.capitalize() for e in mol.elements]
    oh = [t for t in tones if {el[t.i], el[t.j]} == {"O", "H"}]
    assert oh and oh[0].freq_thz == max(t.freq_thz for t in tones)
    assert all(80.0 <= t.freq_hz <= 5000.0 for t in tones)

    w = synthesize(mol, duration_s=0.2)
    assert w.shape[0] == int(0.2 * 44100) and np.abs(w).max() <= 1.0

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = sonify_to_file(mol, os.path.join(d, "mol.wav"),
                           duration_s=0.2)
        with wave.open(p, "rb") as wf:
            assert wf.getnchannels() == 1
            assert wf.getnframes() == int(0.2 * 44100)

    # heavy-only variant drops X-H voices
    assert len(bond_tones(mol, include_h=False)) < len(tones)
