"""Periodic-boundary displacement / wrapping primitives.

Orthorhombic cells only (the reference's SimBox is an axis-aligned extent box,
/root/reference/src/properties/water_sol.rs:579 `cell.extent`). All functions
are shape-polymorphic over leading axes and jit/vmap-safe.
"""
from __future__ import annotations

import jax.numpy as jnp


def minimum_image(dx, box):
    """Minimum-image convention displacement for an orthorhombic box.

    dx : (..., 3) raw displacement
    box: (3,) box extent, or None for a non-periodic (vacuum) system.
    """
    if box is None:
        return dx
    return dx - box * jnp.round(dx / box)


def displacement(xi, xj, box):
    """Displacement vector xi - xj under minimum image."""
    return minimum_image(xi - xj, box)


def wrap(x, box):
    """Wrap positions into [0, box) per axis."""
    if box is None:
        return x
    return x - box * jnp.floor(x / box)


def wrap_molecules(x, box, mol_id, masses):
    """Wrap positions so each molecule's center of mass lies in [0, box).

    Keeps molecules whole (atoms of one molecule move together), which is what
    trajectory writers and the viewer expect. `mol_id` is an int32 per-atom
    molecule index; `masses` weights the COM.
    """
    if box is None:
        return x
    n_mol = 1 + int(mol_id.max()) if not hasattr(mol_id, "aval") else None
    # jit-safe path: segment-sum based COM with static num_segments is
    # required; callers inside jit should use wrap_molecules_static.
    raise NotImplementedError("use wrap_molecules_static inside jit")


def wrap_molecules_static(x, box, mol_id, masses, n_mol: int):
    """jit-safe molecule-whole wrapping (static molecule count)."""
    import jax.ops

    if box is None:
        return x
    w = masses
    m_tot = jax.ops.segment_sum(w, mol_id, num_segments=n_mol)
    com = jax.ops.segment_sum(x * w[:, None], mol_id, num_segments=n_mol) / (
        m_tot[:, None] + 1e-30
    )
    shift = box * jnp.floor(com / box)
    return x - shift[mol_id]
