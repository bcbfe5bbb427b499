"""Ligand screening: pharmacophore models + batched directory screening."""
from .pharmacophore import (  # noqa: F401
    Pharmacophore,
    PharmacophoreFeat,
    PharmacophoreFeatType,
    auto_pharmacophore,
)
from .screen import screen_ligs  # noqa: F401
