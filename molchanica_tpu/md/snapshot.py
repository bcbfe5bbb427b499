"""Snapshot: host-side trajectory frames, reference-compatible layout.

Mirrors the reference `Snapshot` struct (src/md/trajectory.rs:165-181,
src/md/mod.rs:1241-1245): time, solute atom positions, water stored as
separate O/H0/H1 arrays, per-frame energy triple
(potential / nonbonded / bonded), and an hydrogen-bond slot filled by
analysis/hbonds.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class EnergyData:
    energy_potential: float
    energy_potential_nonbonded: float
    energy_potential_bonded: float


@dataclass
class Snapshot:
    time: float                      # ps
    atom_posits: np.ndarray          # [n_solute, 3]
    water_o_posits: Optional[np.ndarray] = None
    water_h0_posits: Optional[np.ndarray] = None
    water_h1_posits: Optional[np.ndarray] = None
    energy_data: Optional[EnergyData] = None
    hydrogen_bonds: list = field(default_factory=list)
    dhdl: Optional[float] = None     # alchemical dH/dlambda at this frame
    kinetic_energy: Optional[float] = None
    box_extent: Optional[np.ndarray] = None


def snapshot_from_state(state, top, terms, dt_ps) -> Snapshot:
    x = np.asarray(state.positions)
    ws, wc, stride = top.water_start, top.water_count, top.water_site_count
    n_real = top.n_atoms_real
    if wc > 0:
        solute = x[:ws]
        waters = x[ws:ws + wc * stride].reshape(wc, stride, 3)
        wo, wh0, wh1 = waters[:, 0], waters[:, 1], waters[:, 2]
    else:
        solute = x[:n_real]
        wo = wh0 = wh1 = None
    e = EnergyData(
        energy_potential=float(terms["energy_potential"]),
        energy_potential_nonbonded=float(terms["energy_potential_nonbonded"]),
        energy_potential_bonded=float(terms["energy_potential_bonded"]),
    ) if terms is not None else None
    return Snapshot(
        time=float(state.step) * dt_ps,
        atom_posits=solute,
        water_o_posits=wo,
        water_h0_posits=wh0,
        water_h1_posits=wh1,
        energy_data=e,
        dhdl=float(state.dhdl_last),
        kinetic_energy=float(state.ke_last),
        box_extent=None if state.box is None else np.asarray(state.box),
    )
