"""Conformer generation: torsion sampling + batched vacuum energy ranking.

Reference: src/molecules/conformers.rs (conformer sampling/representation,
summary features for ML). TPU form: all candidate conformers are scored as
one vmapped batch of vacuum energies.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .characterization import characterize, find_rings, find_rotatable_bonds
from .common import MoleculeCommon


@dataclass
class ConformerSet:
    coords: np.ndarray            # [K, n, 3] sorted by energy
    energies: np.ndarray          # [K] kcal/mol (vacuum)
    torsions: List[Tuple[int, int]] = field(default_factory=list)

    @property
    def best(self) -> np.ndarray:
        return self.coords[0]

    def boltzmann_weights(self, temp_k: float = 298.15) -> np.ndarray:
        """Ensemble weights w_k ∝ exp(-ΔE_k / kT)."""
        kt = 0.0019872041 * temp_k             # kcal/mol
        e = self.energies - self.energies.min()
        w = np.exp(-e / kt)
        return w / w.sum()

    def radii_of_gyration(self) -> np.ndarray:
        com = self.coords.mean(axis=1, keepdims=True)
        return np.sqrt(((self.coords - com) ** 2).sum(-1).mean(-1))

    def deduplicate(self, rmsd_threshold: float = 0.5) -> "ConformerSet":
        """Greedy energy-ordered RMSD dedup (Kabsch-aligned): keep each
        conformer only if no kept lower-energy conformer is within the
        threshold. The reference stores a representative conformer set,
        not every raw torsion sample."""
        from .alignment import kabsch_rmsd

        keep: List[int] = []
        for k in range(len(self.coords)):
            if all(kabsch_rmsd(self.coords[k], self.coords[j])
                   > rmsd_threshold for j in keep):
                keep.append(k)
        return ConformerSet(coords=self.coords[keep],
                            energies=self.energies[keep],
                            torsions=self.torsions)

    def summary_features(self, temp_k: float = 298.15) -> np.ndarray:
        """Conformer-ensemble ML features (energy spread, radius-of-
        gyration stats, Boltzmann-averaged size + ensemble entropy —
        reference conformers.rs feature role)."""
        rg = self.radii_of_gyration()
        e = self.energies - self.energies.min()
        w = self.boltzmann_weights(temp_k)
        rg_boltz = float((w * rg).sum())
        # ensemble "flexibility entropy" -sum w ln w, normalized
        ent = float(-(w * np.log(np.maximum(w, 1e-30))).sum()
                    / max(np.log(max(len(w), 2)), 1e-9))
        return np.asarray([
            len(self.coords), float(e.mean()), float(e.std()),
            float(rg[0]), float(rg.mean()), float(rg.std()),
            rg_boltz, ent,
        ], np.float32)


def _moving_side(n, bonds, bond):
    """Atoms on the j-side of bond (i, j) (the set rotated by the torsion)."""
    i, j = bond
    adj = [[] for _ in range(n)]
    for a, b in bonds:
        adj[a].append(b)
        adj[b].append(a)
    seen = {i, j}
    stack = [j]
    out = []
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                out.append(v)
                stack.append(v)
    return out


def generate_conformers(
    mol: MoleculeCommon,
    n_conformers: int = 32,
    angles_per_torsion: int = 3,
    seed: int = 0,
    params=None,
    minimize_best: bool = False,
) -> ConformerSet:
    """Enumerate/sample torsion combinations, score in one vacuum batch."""
    import jax
    import jax.numpy as jnp

    from ..md.config import MdConfig
    from ..md.energy import make_energy_fn
    from ..molecules.spec import assemble_system
    from .smiles import from_smiles  # noqa: F401  (doc pointer)

    n = mol.n_atoms
    adj = mol.adjacency()
    rings = find_rings(n, mol.bonds)
    torsions = find_rotatable_bonds(mol.elements, mol.bonds,
                                    mol.bond_orders, rings, adj)
    rng = np.random.default_rng(seed)

    from ..docking.poses import apply_torsion

    base = np.asarray(mol.positions, float)
    cands = [base]
    if torsions:
        n_random = max(n_conformers - 1, 0)
        for _ in range(n_random):
            c = base.copy()
            for bond in torsions:
                k = rng.integers(0, angles_per_torsion)
                ang = 2 * np.pi * k / angles_per_torsion \
                    + rng.normal(0, 0.15)
                moving = _moving_side(n, mol.bonds, bond)
                if moving:
                    c = apply_torsion(c, bond, moving, float(ang))
            cands.append(c)
    coords = np.asarray(cands, np.float32)

    # batched vacuum energies
    spec = mol.to_spec(params=params, strict=False)
    asys = assemble_system([spec], relieve_clashes=False)
    top = asys.topology
    cfg = MdConfig(dtype="float32")
    e_fn = make_energy_fn(top, cfg, "allpairs")
    npad = top.n_atoms

    def energy_one(x):
        xp = jnp.full((npad, 3), 1e6, jnp.float32)
        xp = jax.lax.dynamic_update_slice(xp, x, (0, 0))
        e, _ = e_fn(xp, None, jnp.asarray(1.0, jnp.float32))
        return e

    energies = np.asarray(
        jax.jit(jax.vmap(energy_one))(jnp.asarray(coords)))
    order = np.argsort(energies)
    cset = ConformerSet(coords=coords[order].astype(np.float64),
                        energies=energies[order], torsions=torsions)
    if minimize_best:
        from ..md.minimize import fire_minimize

        couple = jnp.asarray(1.0, jnp.float32)

        def force_fn(x, box, c):
            e, grad = jax.value_and_grad(
                lambda xx: e_fn(xx, box, c)[0])(x)
            return -grad, (e, None)

        x0 = jnp.asarray(np.pad(cset.coords[0],
                                ((0, npad - n), (0, 0)),
                                constant_values=1e6), jnp.float32)
        dof = jnp.arange(npad) < n
        x_min, e_min = fire_minimize(force_fn, x0, None, couple,
                                     dof.astype(jnp.float32), n_steps=200)
        cset.coords[0] = np.asarray(x_min)[:n]
        cset.energies[0] = float(e_min)
    return cset
