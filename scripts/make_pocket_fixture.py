"""Build a committed protein-pocket docking fixture, fully offline.

The benchmark's docking config (BASELINE config 4) wants a REAL concave
pocket. This environment has zero network and ships no PDB data, so a
PDBbind complex cannot be embedded (that path stays available through
MOLCHANICA_PDBBIND_ROOT, drug_design/pdbbind.py). Instead this script
manufactures a physically realistic pocket with the framework's own
physics — the honest offline analog:

1. build a 48-residue amphipathic peptide, collapse it with vacuum
   Langevin MD under a weak radial restraint toward its centroid (the
   offline analog of hydrophobic compaction on MD-accessible timescales),
   then equilibrate FREE at 300 K so the final geometry is a relaxed,
   unrestrained local minimum of the real force field,
2. embed a drug-sized ligand (ibuprofen) from SMILES, shoot it at the
   globule with docking/shoot.py-style placement + minimization so it
   settles into a surface cavity,
3. write systems/data/pocket_fixture.pdb (receptor) and
   pocket_ligand.sdf (posed ligand) for bench_all config 4 +
   tests/test_docking pocket sanity.

Run offline once; outputs are committed. Reference framing:
drug_design/pdbbind.rs supplies real complexes when a PDBbind release is
mounted; this fixture keeps the benchmark honest without one.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "molchanica_tpu", "systems", "data")


def main():
    from molchanica_tpu.md.config import (HydrogenConstraint, Integrator,
                                          MdConfig)
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.molecules.peptide import prepare_peptide
    from molchanica_tpu.molecules.peptide_builder import build_peptide
    from molchanica_tpu.molecules.smiles import from_smiles
    from molchanica_tpu.molecules.spec import assemble_system
    from molchanica_tpu.io.pdb import write_pdb
    from molchanica_tpu.io.sdf import write_sdf

    # amphipathic sequence: hydrophobic core drivers + polar surface
    seq = "MKVLFEAIKLGWQRSDNPTYVFHMILKAEWSGDRLVNQFYTAKIPELC"
    mol = prepare_peptide(build_peptide(seq))
    asys = assemble_system([mol])
    import jax.numpy as jnp
    mask_j = np.asarray(asys.topology.atom_mask) > 0
    center = np.asarray(asys.positions)[mask_j].mean(0)
    center_j = jnp.asarray(center, jnp.float32)
    mask_col = jnp.asarray(mask_j[:, None].astype(np.float32))

    def radial_pull(x):
        # weak inward pull, saturating at 8 kcal/mol/A beyond 16 A
        d = (x - center_j) * mask_col
        r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1, keepdims=True), 1e-6))
        k = 0.5
        fmag = jnp.minimum(k * r, 8.0)
        return -d / r * fmag

    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=5.0),
                   temp_target=350.0, dtype="float32",
                   hydrogen_constraint=HydrogenConstraint.shake(),
                   max_init_relaxation_iters=400, steps_per_chunk=1000,
                   seed=11)
    sim = MdSim(asys.topology, cfg, asys.positions,
                external_forces_fn=radial_pull)
    print("restrained collapse at 350 K ...", flush=True)
    sim.step(0.0005, 4000, force_cap=500.0)
    for k in range(30):
        sim.step(0.001, 1000, force_cap=2000.0)
        t = float(sim.temperature())
        assert np.isfinite(t), f"NaN at collapse chunk {k}"
        if k % 5 == 0:
            print(f"  chunk {k}: T = {t:.0f} K", flush=True)
    cfg2 = MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
                    temp_target=300.0, dtype="float32",
                    hydrogen_constraint=HydrogenConstraint.shake(),
                    max_init_relaxation_iters=None, steps_per_chunk=1000,
                    seed=12)
    sim = MdSim(asys.topology, cfg2, np.asarray(sim.state.positions))
    print("FREE equilibration at 300 K ...", flush=True)
    for k in range(20):
        sim.step(0.001, 1000, force_cap=2000.0)
        t = float(sim.temperature())
        assert np.isfinite(t), f"NaN at free-equil chunk {k}"
    mask = np.asarray(asys.topology.atom_mask) > 0     # drop pad sentinels
    x = np.asarray(sim.state.positions)[mask]
    # recenter: Langevin COM drift can carry the globule far from the
    # origin, overflowing the fixed-width PDB/SDF coordinate fields
    x = x - x.mean(0)
    rg = np.sqrt(((x - x.mean(0)) ** 2).sum(1).mean())
    print(f"collapsed: Rg = {rg:.1f} A over {len(x)} atoms, "
          f"T = {sim.temperature():.0f} K")
    assert rg < 16.0, f"did not collapse (Rg {rg:.1f} A) - not writing"

    # rebuild a MoleculeCommon for the writer (prepare_peptide returns a
    # parameterized MolSpec; elements recovered from masses)
    from molchanica_tpu.molecules.common import MoleculeCommon
    _BY_MASS = [(1.5, "H"), (13.5, "C"), (15.0, "N"), (17.0, "O"),
                (33.0, "S")]

    def elem_of(m):
        for hi, e in _BY_MASS:
            if m < hi:
                return e
        return "C"

    spec = mol
    els_all = [elem_of(m) for m in np.asarray(spec.masses)]
    keep = np.where(mask)[0]
    remap = {int(o): k for k, o in enumerate(keep)}
    n_spec = len(els_all)
    rec = MoleculeCommon(
        elements=[els_all[i] for i in keep if i < n_spec],
        positions=x,
        bonds=[(remap[int(b[0])], remap[int(b[1])])
               for b in spec.bonds
               if int(b[0]) in remap and int(b[1]) in remap],
        name="pocket_fixture")
    pdb_path = os.path.join(OUT, "pocket_fixture.pdb")
    write_pdb(rec, pdb_path)

    # ligand: embed + place at the largest surface cavity (approximated as
    # the direction of lowest atom density from the centroid)
    lig = from_smiles("CC(C)Cc1ccc(cc1)C(C)C(=O)O")       # ibuprofen
    com = x.mean(0)
    # density per direction over a coarse sphere sampling
    dirs = np.random.default_rng(3).normal(size=(256, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rel = x - com
    proj = rel @ dirs.T                                   # [n, 256]
    score = (proj > 0.6 * np.linalg.norm(rel, axis=1, keepdims=True)).sum(0)
    d = dirs[np.argmin(score)]
    surf_r = np.percentile(np.linalg.norm(rel, axis=1), 85)
    lx = np.asarray(lig.positions)
    lx = lx - lx.mean(0) + com + d * (surf_r + 1.5)
    lig.positions = lx
    sdf_path = os.path.join(OUT, "pocket_ligand.sdf")
    write_sdf(lig, sdf_path)
    print(f"wrote {pdb_path} and {sdf_path}")


if __name__ == "__main__":
    main()
