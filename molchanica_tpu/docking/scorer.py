"""Batched pose scoring: the vmapped TPU form of calc_binding_energy.

Reference scoring (src/docking/legacy/mod.rs:217 + BindingEnergy weights at
:167-208): SIMD LJ sum + H-bond counting (both directions) + hydrophobic
contact well + Barnes-Hut Coulomb -> weighted score; VdW clash pre-culling
(process_poses, :511). TPU form: one fused [P, L, R] pair-energy evaluation
(elementwise VPU work, poses vmapped), clash culling as a cheap mask, no
tree code needed — the receptor is already site-culled.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COULOMB_CONST
from .setup import DockingSetup

# Weighted-score coefficients (BindingEnergy analog; the reference's exact
# weights live in src/docking/legacy/mod.rs:167-208 — these are the same
# shape of linear combination, tuned loosely).
W_LJ = 1.0
W_COULOMB = 0.15
W_HBOND = -1.2        # kcal/mol per geometric H-bond
W_HYDROPHOBIC = -0.15 # per apolar contact in the well

HB_DIST = 2.6         # H...acceptor distance for a full H-bond (A)
HB_WIDTH = 0.6
PHOBIC_R0 = 4.0
PHOBIC_WIDTH = 1.0
CLASH_R = 1.6         # VdW clash-cull distance (process_poses analog)


@dataclass
class BindingEnergy:
    """Per-pose score breakdown (reference BindingEnergy)."""
    total: np.ndarray       # [P] weighted score
    lj: np.ndarray
    coulomb: np.ndarray
    h_bonds: np.ndarray
    hydrophobic: np.ndarray
    clash: np.ndarray       # bool: True = culled


def make_pose_scorer(setup: DockingSetup, ligand, elements=None):
    """Build score(poses [P, L, 3]) -> dict of per-pose arrays (jitted).

    `ligand`: MolSpec-like with charges/lj_sigma/lj_eps. `elements` enables
    ligand donor/acceptor/hydrophobic classification.
    """
    lq = jnp.asarray(np.asarray(ligand.charges), jnp.float32)
    lsig = jnp.asarray(np.asarray(ligand.lj_sigma), jnp.float32)
    leps = jnp.asarray(np.asarray(ligand.lj_eps), jnp.float32)
    L = lq.shape[0]
    if elements is not None:
        el = [e.capitalize() for e in elements]
        qn = np.asarray(ligand.charges)
        ldonor = np.array([1.0 if (e == "H" and q > 0.25) else 0.0
                           for e, q in zip(el, qn)], np.float32)
        lacceptor = np.array([1.0 if e in ("N", "O") else 0.0 for e in el],
                             np.float32)
        lphobic = np.array([1.0 if (e == "C" and abs(q) < 0.2) else 0.0
                            for e, q in zip(el, qn)], np.float32)
    else:
        mn = np.asarray(ligand.masses)
        qn = np.asarray(ligand.charges)
        ldonor = ((mn < 2.0) & (qn > 0.25)).astype(np.float32)
        lacceptor = ((mn > 13.0) & (mn < 17.5) & (qn < -0.3)).astype(np.float32)
        lphobic = ((np.abs(qn) < 0.2) & (mn > 11.0) & (mn < 13.0)).astype(np.float32)
    ldonor = jnp.asarray(ldonor)
    lacceptor = jnp.asarray(lacceptor)
    lphobic = jnp.asarray(lphobic)

    rp, rq = setup.rec_pos, setup.rec_q
    rsig, reps, rmask = setup.rec_sigma, setup.rec_eps, setup.rec_mask
    rdon, racc, rphob = setup.rec_donor, setup.rec_acceptor, setup.rec_hydrophobic

    def score_one(pose):                      # pose [L, 3]
        d = pose[:, None, :] - rp[None, :, :]          # [L, R, 3]
        r2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-4)
        r = jnp.sqrt(r2)
        sig = 0.5 * (lsig[:, None] + rsig[None, :])
        eps4 = 4.0 * jnp.sqrt(leps[:, None] * reps[None, :])
        s6 = (sig * sig / r2) ** 3
        e_lj = jnp.clip(eps4 * (s6 * s6 - s6), -1e5, 1e5) * rmask[None, :]
        e_c = COULOMB_CONST * lq[:, None] * rq[None, :] / r * rmask[None, :]
        # geometric H-bonds, both directions (lig donor -> rec acceptor and
        # rec donor -> lig acceptor) with a smooth distance well
        hb_well = jnp.exp(-((r - HB_DIST) / HB_WIDTH) ** 2)
        hb = (ldonor[:, None] * racc[None, :]
              + lacceptor[:, None] * rdon[None, :]) * hb_well * rmask[None, :]
        # hydrophobic contact well
        phob_well = jnp.exp(-((r - PHOBIC_R0) / PHOBIC_WIDTH) ** 2)
        phob = lphobic[:, None] * rphob[None, :] * phob_well * rmask[None, :]
        clash = jnp.any((r < CLASH_R) & (rmask[None, :] > 0)
                        & (leps[:, None] > 1e-6) & (reps[None, :] > 1e-6))
        return (jnp.sum(e_lj), jnp.sum(e_c), jnp.sum(hb), jnp.sum(phob),
                clash)

    @jax.jit
    def score(poses):
        e_lj, e_c, hb, phob, clash = jax.vmap(score_one)(poses)
        total = (W_LJ * e_lj + W_COULOMB * e_c + W_HBOND * hb
                 + W_HYDROPHOBIC * phob)
        total = jnp.where(clash, jnp.inf, total)
        return dict(total=total, lj=e_lj, coulomb=e_c, h_bonds=hb,
                    hydrophobic=phob, clash=clash)

    return score


def score_poses(setup: DockingSetup, ligand, poses, elements=None,
                batch_size: int = 4096) -> BindingEnergy:
    """Score [P, L, 3] poses in device batches; returns BindingEnergy."""
    scorer = make_pose_scorer(setup, ligand, elements)
    outs = {k: [] for k in ("total", "lj", "coulomb", "h_bonds",
                            "hydrophobic", "clash")}
    poses = np.asarray(poses, np.float32)
    n = len(poses)
    pad = (-n) % batch_size
    if pad:
        poses = np.concatenate([poses, np.repeat(poses[-1:], pad, 0)])
    for s in range(0, len(poses), batch_size):
        res = scorer(jnp.asarray(poses[s:s + batch_size]))
        for k in outs:
            outs[k].append(np.asarray(res[k]))
    cat = {k: np.concatenate(v)[:n] for k, v in outs.items()}
    return BindingEnergy(
        total=cat["total"], lj=cat["lj"], coulomb=cat["coulomb"],
        h_bonds=cat["h_bonds"], hydrophobic=cat["hydrophobic"],
        clash=cat["clash"])


def find_optimal_pose(setup: DockingSetup, ligand, poses, elements=None,
                      top_k: int = 10):
    """Reference find_optimal_pose (legacy/mod.rs:694): score all, return the
    best poses sorted by weighted score."""
    be = score_poses(setup, ligand, poses, elements)
    order = np.argsort(be.total)
    return order[:top_k], be
