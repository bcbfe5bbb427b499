"""Docking: batched rigid-receptor pose scoring on TPU.

Reference design: src/docking/legacy (DockingSetup precompute, init_poses
grid x orientation x torsion enumeration, process_poses clash-cull + scoring,
calc_binding_energy weighted score — SURVEY.md §2.3) re-expressed as one
vmapped batched energy evaluation (BASELINE config 4: 10k poses/batch).
"""
from .site import DockingSite, find_sites  # noqa: F401
from .setup import DockingSetup  # noqa: F401
from .poses import init_poses  # noqa: F401
from .scorer import BindingEnergy, score_poses, find_optimal_pose  # noqa: F401
