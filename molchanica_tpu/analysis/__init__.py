"""Trajectory/structure analysis: H-bonds, mixing metrics, RDF."""
from .hbonds import HydrogenBond, find_hydrogen_bonds  # noqa: F401
