"""All five BASELINE benchmark configs (BASELINE.md "configs").

Prints one JSON line per config. Config 3 (the headline 25k solvated
protein) is bench.py at the repo root; this script measures the other
four plus a quick config-3 pass, for the full report.

Run from the repo root on the target backend.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


_RESULTS = []


def report(cfg_name, **kw):
    row = {"config": cfg_name, **kw}
    _RESULTS.append(row)
    print(json.dumps(row), flush=True)


def config1_vacuum_ligand():
    """GAFF2 ligand (~50 atoms), vacuum, all-pairs, NVE velocity-Verlet."""
    from molchanica_tpu.md.config import Integrator, MdConfig
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.molecules.smiles import from_smiles
    from molchanica_tpu.molecules.spec import assemble_system

    mol = from_smiles("CC(C)Cc1ccc(cc1)C(C)C(=O)O")      # ibuprofen, 33+H
    spec = mol.to_spec(strict=False)
    asys = assemble_system([spec])
    cfg = MdConfig(integrator=Integrator.verlet_velocity(thermostat=None),
                   temp_target=300.0, dtype="float32",
                   max_init_relaxation_iters=300, steps_per_chunk=500,
                   seed=1)
    sim = MdSim(asys.topology, cfg, asys.positions)
    sim.step(0.001, 1000)                      # compile + settle (2 chunks,
    t0 = time.perf_counter()                   # so the timed loop is warm)
    sim.step(0.001, 10000)
    el = time.perf_counter() - t0
    report("1_vacuum_ligand_nve",
           n_atoms=int(asys.topology.n_atoms_real),
           us_per_step=round(el / 10000 * 1e6, 2),
           ns_per_day=round(0.001 * 86400 / (el / 10000) / 1000, 1))


def config2_vacuum_peptide():
    """Short peptide, vacuum, ff14SB-family, Langevin NVT."""
    from molchanica_tpu.md.config import (
        HydrogenConstraint, Integrator, MdConfig)
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.molecules.peptide import prepare_peptide
    from molchanica_tpu.molecules.peptide_builder import build_peptide
    from molchanica_tpu.molecules.spec import assemble_system

    spec = prepare_peptide(build_peptide("ACDEFGHIKLMNPQRSTVWY"))
    asys = assemble_system([spec])
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=2.0),
                   temp_target=300.0,
                   hydrogen_constraint=HydrogenConstraint.shake(),
                   dtype="float32", max_init_relaxation_iters=300,
                   steps_per_chunk=500, seed=1)
    sim = MdSim(asys.topology, cfg, asys.positions)
    sim.step(0.002, 1000)                      # compile + settle, warm chunk
    t0 = time.perf_counter()
    sim.step(0.002, 10000)
    el = time.perf_counter() - t0
    report("2_vacuum_peptide_nvt",
           n_atoms=int(asys.topology.n_atoms_real),
           us_per_step=round(el / 10000 * 1e6, 2),
           ns_per_day=round(0.002 * 86400 / (el / 10000) / 1000, 1),
           temperature_K=round(float(sim.temperature()), 1))


def config4_docking():
    """Rigid-receptor docking: 10k poses vs a pocket, poses/sec.

    With MOLCHANICA_PDBBIND_ROOT set, the pocket + ligand come from the
    first usable complex of a real PDBbind release (drug_design.pdbbind);
    otherwise a pocket is cut from a built receptor (molecules.pocket) so
    the same pocket-scoped scoring path is exercised."""
    from molchanica_tpu.docking.poses import init_poses
    from molchanica_tpu.docking.scorer import score_poses
    from molchanica_tpu.docking.setup import DockingSetup
    from molchanica_tpu.docking.site import DockingSite
    from molchanica_tpu.drug_design.pdbbind import load_entries
    from molchanica_tpu.molecules.peptide import prepare_peptide
    from molchanica_tpu.molecules.peptide_builder import build_peptide
    from molchanica_tpu.molecules.pocket import MoleculePocket
    from molchanica_tpu.molecules.smiles import from_smiles

    lig = None
    pocket = None
    source = "builtin_receptor"
    for entry in load_entries(subset="any"):
        if entry.pocket and entry.ligand_sdf:
            from molchanica_tpu.io.sdf import read_sdf
            ligmol = read_sdf(entry.ligand_sdf)
            if isinstance(ligmol, list):
                ligmol = ligmol[0]
            pocket = MoleculePocket.from_file(entry.pocket,
                                              pdb_id=entry.pdb_id,
                                              ligand=ligmol)
            lig = ligmol.to_spec(strict=False)
            source = f"pdbbind:{entry.pdb_id}"
            break
    if pocket is None:
        # committed pocket fixture: a physically collapsed 48-residue
        # globule + posed ligand built by scripts/make_pocket_fixture.py
        # (this offline env ships no PDBbind data; the PDBbind path above
        # activates via MOLCHANICA_PDBBIND_ROOT)
        import molchanica_tpu
        fdir = os.path.join(os.path.dirname(os.path.abspath(
            molchanica_tpu.__file__)), "systems", "data")
        fpdb = os.path.join(fdir, "pocket_fixture.pdb")
        fsdf = os.path.join(fdir, "pocket_ligand.sdf")
        if os.path.exists(fpdb) and os.path.exists(fsdf):
            from molchanica_tpu.io.sdf import read_sdf
            ligmol = read_sdf(fsdf)
            if isinstance(ligmol, list):
                ligmol = ligmol[0]
            pocket = MoleculePocket.from_file(fpdb, pdb_id="fixture",
                                              ligand=ligmol)
            lig = ligmol.to_spec(strict=False)
            source = "pocket_fixture(collapsed globule)"
    if pocket is None:
        rec = prepare_peptide(build_peptide("ACDEFGHIKLMNPQRSTVW" * 2))
        center = np.asarray(rec.positions).mean(axis=0)
        site = DockingSite(site_center=center, site_radius=8.0)
        lig = from_smiles("CC(=O)Nc1ccc(O)cc1").to_spec(strict=False)
    else:
        rec = pocket.mol.to_spec(strict=False)
        c, r = pocket.docking_site()
        site = DockingSite(site_center=c, site_radius=min(r, 10.0))
    setup = DockingSetup.new(rec, site)
    poses = init_poses(lig.positions, site.site_center,
                       site_radius=float(site.site_radius), n_grid=8,
                       n_orientations=40, max_poses=10000, seed=1)
    # compile
    score_poses(setup, lig, poses[:128])
    t0 = time.perf_counter()
    e = score_poses(setup, lig, poses)
    n = len(poses)
    el = time.perf_counter() - t0
    report("4_docking_10k_poses",
           n_poses=int(n), poses_per_sec=round(n / el, 1),
           best_kcal=round(float(np.min(np.asarray(e.total))), 2),
           receptor=source)


def config5_dna_and_screening():
    """Solvated DNA duplex MD (FastSim colpair engine) + replica screening.

    The duplex box is a periodic solvated system — exactly FastSim's shape
    — so it rides the same kernel as the 25k headline config instead of
    the general MdSim path (round-3 measured MdSim 16x slower per step
    here, and 30 K hot from under-equilibration)."""
    from molchanica_tpu.md.config import (
        HydrogenConstraint, Integrator, MdConfig)
    from molchanica_tpu.md.engine import MdSim
    from molchanica_tpu.md.fast_engine import FastSim
    from molchanica_tpu.molecules.nucleic_acid import MoleculeNucleicAcid
    from molchanica_tpu.molecules.spec import assemble_system
    from molchanica_tpu.parallel.replicas import ReplicaFarm
    from molchanica_tpu.systems.water import OPC

    na = MoleculeNucleicAcid.from_seq("GATTACAGATT", double=True)
    spec = na.to_spec()
    box = np.array([46.0] * 3)
    spec = spec.translated(box / 2 - np.asarray(spec.positions).mean(0))
    asys = assemble_system([spec], box_extent=box, water_model=OPC,
                           neutralize=True, seed=2)
    cfg = MdConfig(integrator=Integrator.langevin_middle(gamma=1.0),
                   temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0,
                   hydrogen_constraint=HydrogenConstraint.shake(),
                   dtype="float32", neighbor_rebuild_every=20, seed=2)
    sim = FastSim(asys.topology, cfg, asys.positions,
                  box_extent=asys.box_extent)
    # staged equilibration from the synthetic packing: minimize, capped
    # small steps, then thermalize long enough for the Langevin bath to
    # pull the packing heat out (the round-3 +30 K came from timing after
    # only ~800 steps)
    sim.minimize(300)
    sim.step(0.0005, 200, force_cap=2000.0)
    sim.step(0.001, 300, force_cap=5000.0)
    sim.step(0.002, 1500)
    t0 = time.perf_counter()
    sim.step(0.002, 1000)
    el = time.perf_counter() - t0
    n_at = int(asys.topology.n_atoms_real)
    # multi-replica screening throughput on a solvated protein-ligand-style
    # system (vmapped MdSim replicas; independent-replica farm metric)
    cfg_r = MdConfig(integrator=Integrator.langevin_middle(gamma=5.0),
                     temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0,
                     hydrogen_constraint=HydrogenConstraint.shake(),
                     dtype="float32", max_init_relaxation_iters=150,
                     steps_per_chunk=50, seed=2)
    sim_r = MdSim(asys.topology, cfg_r, asys.positions,
                  box_extent=asys.box_extent)
    farm = ReplicaFarm(sim_r, 4, seed=3)
    farm.step(0.002, 5)
    t1 = time.perf_counter()
    farm.step(0.002, 50)
    el2 = time.perf_counter() - t1
    report("5_dna_duplex_and_screening",
           n_atoms=n_at,
           ms_per_step=round(el / 1000 * 1000, 2),
           ns_per_day=round(0.002 * 86400 / (el / 1000) / 1000, 1),
           replica_steps_per_sec=round(4 * 50 / el2, 1),
           temperature_K=round(float(sim.temperature()), 1),
           engine="fastsim_colpair")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    which = args or ["1", "2", "4", "5"]
    fns = {"1": config1_vacuum_ligand, "2": config2_vacuum_peptide,
           "4": config4_docking, "5": config5_dna_and_screening}
    for w in which:
        t0 = time.perf_counter()
        try:
            fns[w]()
        except Exception as e:
            report(f"{w}_failed", error=f"{type(e).__name__}: {e}"[:300])
        print(f"[bench_all] config {w} took "
              f"{time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
    if out_path:
        # committed artifact (VERDICT r4 ask #5): one JSON line per config
        with open(out_path, "w") as f:
            for row in _RESULTS:
                f.write(json.dumps(row) + "\n")
        print(f"[bench_all] wrote {out_path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
