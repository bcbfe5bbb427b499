"""Nonbonded energy: Lennard-Jones + Coulomb.

Three evaluation paths share the same per-pair math:
  - all-pairs NxN (vacuum / validation / small systems; the analog of the
    reference's brute-force CUDA kernels in /root/reference/src/cuda/cuda.cu)
  - pair-list corrections (1-4 scaled pairs, Ewald exclusion corrections)
  - the cell-window path for large periodic systems lives in ops/cells.py and
    reuses `pair_lj_coulomb` below.

Functional forms mirror /root/reference/src/cuda/util.cu:54-119
(lj_V, lj_force_v2, coulomb_force): LJ = 4 eps ((s/r)^12 - (s/r)^6),
Coulomb = k q1 q2 / r (direct space uses erfc damping under Ewald).

Alchemical decoupling: pairs straddling the coupled molecule get
Beutler-style softcore LJ and linearly lambda-scaled Coulomb, so that
lambda=1 is fully coupled and lambda=0 fully decoupled — matching the
reference's convention "0 = fully coupled"?  No: the reference documents
lambda 0 = fully coupled (/root/repo/SURVEY.md §2.1 alchemical API), so we
use coupling strength c = 1 - lambda internally while exposing the
reference's lambda convention at the API (md/alchemical.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import COULOMB_CONST
from .pbc import displacement

SOFTCORE_ALPHA = 0.5

# Shared per-pair LJ energy clip — see ops/pallas/direct_force.py LJ_CLIP.
LJ_CLIP = 1.0e7


def lorentz_berthelot(sig_i, sig_j, eps_i, eps_j):
    return 0.5 * (sig_i + sig_j), jnp.sqrt(eps_i * eps_j)


def lj_energy(r2, sigma, eps):
    """Standard 12-6 LJ from squared distance (avoids sqrt)."""
    s2 = (sigma * sigma) / r2
    s6 = s2 * s2 * s2
    return 4.0 * eps * (s6 * s6 - s6)


def lj_softcore_energy(r2, sigma, eps, couple):
    """Beutler softcore: reduces to standard LJ at couple=1, 0 at couple=0.

    V = 4 eps c [ (a(1-c) + (r/s)^6)^-2 - (a(1-c) + (r/s)^6)^-1 ]
    """
    s2 = (sigma * sigma) / r2
    s6 = s2 * s2 * s2               # (sigma/r)^6
    # inv = 1/(a + s^-6) written as s6/(a s6 + 1): finite and differentiable
    # at sigma = 0 (e.g. water hydrogens carry no LJ site)
    inv = s6 / (SOFTCORE_ALPHA * (1.0 - couple) * s6 + 1.0)
    return 4.0 * eps * couple * (inv * inv - inv)


def coulomb_energy(r, qq, ewald_beta=None):
    """Direct-space Coulomb: k qq / r, or k qq erfc(beta r)/r under Ewald."""
    if ewald_beta is None:
        return COULOMB_CONST * qq / r
    return COULOMB_CONST * qq * jax.lax.erfc(ewald_beta * r) / r


def switch_fn(r2, r_switch, r_cut):
    """GROMACS-style potential switch on [r_switch, r_cut] from r^2.

    S = 1 for r < r_switch, 0 for r > r_cut, quintic smoothstep between.
    """
    t = (jnp.sqrt(r2) - r_switch) / jnp.maximum(r_cut - r_switch, 1e-6)
    t = jnp.clip(t, 0.0, 1.0)
    return 1.0 - t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def pair_lj_coulomb(
    r2,
    qq,
    sigma,
    eps,
    couple,             # per-pair coupling strength in [0,1]; 1 = normal
    ewald_beta=None,
    cutoff=None,
    lj_switch_start=None,
    lj_scale=1.0,
    coulomb_scale=1.0,
    coulomb_cutoff=None,
):
    """Per-pair nonbonded energy (E_lj, E_coul) from squared distance.

    All args broadcast. Callers apply their own validity masks; r2 must be
    clamped away from 0 before calling (use `jnp.maximum(r2, eps)`).
    """
    r2 = jnp.maximum(r2, 1e-4)
    r = jnp.sqrt(r2)
    e_lj = jnp.clip(lj_softcore_energy(r2, sigma, eps, couple),
                    -LJ_CLIP, LJ_CLIP) * lj_scale
    e_c = coulomb_energy(r, qq, ewald_beta) * couple * coulomb_scale
    if cutoff is not None:
        in_range = r2 < cutoff * cutoff
        if lj_switch_start is not None:
            e_lj = e_lj * switch_fn(r2, lj_switch_start, cutoff)
        e_lj = jnp.where(in_range, e_lj, 0.0)
        # Coulomb may carry its own (longer) cutoff — truncating the erfc
        # tail at the LJ cutoff would be inconsistent with the other
        # direct-space backends (round-1 advisor finding)
        rc_c = coulomb_cutoff if coulomb_cutoff is not None else cutoff
        e_c = jnp.where(r2 < rc_c * rc_c, e_c, 0.0)
    return e_lj, e_c


def _pair_mask_dense(n, atom_mask, excl_idx, excl_mask, pair14_idx, pair14_mask):
    """[N,N] upper-triangle interaction mask with exclusions and 1-4 removed."""
    mask = atom_mask[:, None] * atom_mask[None, :]
    iu = jnp.triu(jnp.ones((n, n), bool), k=1)
    mask = jnp.where(iu, mask, 0.0)
    for idx, m in ((excl_idx, excl_mask), (pair14_idx, pair14_mask)):
        i, j = idx[:, 0], idx[:, 1]
        upd = jnp.where(m > 0, 0.0, 1.0)
        # set both orders to be safe about ordering of (i, j)
        mask = mask.at[i, j].mul(upd)
        mask = mask.at[j, i].mul(upd)
    return mask


def allpairs_energy(
    x,
    box,
    top,
    couple_strength,      # scalar coupling of the alchemical molecule (1=on)
    ewald_beta=None,
    cutoff=None,
    lj_switch_start=None,
    lj_enabled=True,
    coulomb_enabled=True,
):
    """Dense NxN nonbonded energy. Returns (E_lj, E_coul).

    O(N^2) — intended for vacuum systems, validation, and the docking scorer's
    pose batches (vmapped), not for large solvated boxes.
    """
    n = x.shape[0]
    dx = displacement(x[:, None, :], x[None, :, :], box)
    r2 = jnp.sum(dx * dx, axis=-1)
    sig, eps = lorentz_berthelot(
        top.lj_sigma[:, None], top.lj_sigma[None, :],
        top.lj_eps[:, None], top.lj_eps[None, :],
    )
    qq = top.charges[:, None] * top.charges[None, :]
    cm = top.couple_mask
    is_alch = cm[:, None] + cm[None, :] - 2.0 * cm[:, None] * cm[None, :]
    couple = 1.0 - is_alch * (1.0 - couple_strength)
    mask = _pair_mask_dense(
        n, top.atom_mask, top.excl_idx, top.excl_mask,
        top.pair14_idx, top.pair14_mask,
    )
    e_lj, e_c = pair_lj_coulomb(
        r2, qq, sig, eps, couple, ewald_beta, cutoff, lj_switch_start,
    )
    if not lj_enabled:
        e_lj = jnp.zeros_like(e_lj)
    if not coulomb_enabled:
        e_c = jnp.zeros_like(e_c)
    return jnp.sum(e_lj * mask), jnp.sum(e_c * mask)


def pairlist_energy(
    x, box, top, idx, mask, coulomb_scale, lj_scale, couple_strength,
    ewald_beta=None,
):
    """Nonbonded energy over an explicit pair list (1-4 terms, corrections).

    coulomb_scale / lj_scale are per-pair multipliers (e.g. 1/scee, 1/scnb).
    Under Ewald the caller handles erf-corrections separately (see
    ewald_exclusion_correction).
    """
    i, j = idx[:, 0], idx[:, 1]
    dx = displacement(x[i], x[j], box)
    r2 = jnp.maximum(jnp.sum(dx * dx, axis=-1), 1e-4)
    sig, eps = lorentz_berthelot(
        top.lj_sigma[i], top.lj_sigma[j], top.lj_eps[i], top.lj_eps[j],
    )
    qq = top.charges[i] * top.charges[j]
    cm = top.couple_mask
    is_alch = cm[i] + cm[j] - 2.0 * cm[i] * cm[j]
    couple = 1.0 - is_alch * (1.0 - couple_strength)
    e_lj, e_c = pair_lj_coulomb(
        r2, qq, sig, eps, couple, ewald_beta=ewald_beta,
        lj_scale=lj_scale, coulomb_scale=coulomb_scale,
    )
    return jnp.sum(e_lj * mask), jnp.sum(e_c * mask)


def ewald_exclusion_correction(x, box, top, couple_strength, ewald_beta):
    """-k qq erf(beta r)/r over excluded and 1-4 pairs.

    The reciprocal-space sum includes ALL pairs; excluded/1-4 pairs must have
    the smooth erf part removed (1-4 Coulomb is then re-added at 1/scee by
    pairlist_energy with ewald_beta=None ... handled by the caller in
    md/energy.py).

    The alchemical factor is the PRODUCT of the per-atom charge-scaling
    factors (1 - cm_i (1-c)) (1 - cm_j (1-c)) — exactly what the PME
    reciprocal sum applied to this pair via its scaled per-atom charges —
    so intramolecular excluded pairs cancel identically at every couple
    value (GROMACS couple-intramol=no semantics).
    """
    def erf_part(idx, mask):
        i, j = idx[:, 0], idx[:, 1]
        dx = displacement(x[i], x[j], box)
        r = jnp.sqrt(jnp.maximum(jnp.sum(dx * dx, axis=-1), 1e-4))
        qq = top.charges[i] * top.charges[j]
        cm = top.couple_mask
        couple = (1.0 - cm[i] * (1.0 - couple_strength)) \
            * (1.0 - cm[j] * (1.0 - couple_strength))
        e = COULOMB_CONST * qq * couple * jax.lax.erf(ewald_beta * r) / r
        return jnp.sum(e * mask)

    return -(erf_part(top.excl_idx, top.excl_mask)
             + erf_part(top.pair14_idx, top.pair14_mask))


def intramol_pairs_np(top, max_coupled: int = 2048):
    """Host-side: non-excluded, non-1-4 pairs internal to the coupled
    molecule, as an int32 [P, 2] array (P >= 1; padded with (0, 0) mask 0).

    Used for the couple-intramol=no compensation term: these pairs appear in
    the PME reciprocal sum with couple^2-scaled charges but must stay at
    FULL strength at every lambda (the reference's decoupling convention,
    /root/reference/src/md/prep.rs lambda docs; GROMACS couple-intramol=no).
    """
    import numpy as np

    cm = np.asarray(top.couple_mask) * np.asarray(top.atom_mask)
    coupled = np.where(cm > 0)[0]
    if coupled.size == 0:
        return (np.zeros((1, 2), np.int32), np.zeros((1,), np.float32))
    if coupled.size > max_coupled:
        raise ValueError(
            f"coupled molecule too large ({coupled.size} atoms) for the "
            "intramolecular compensation pair list")
    skip = set()
    for idx, m in ((np.asarray(top.excl_idx), np.asarray(top.excl_mask)),
                   (np.asarray(top.pair14_idx), np.asarray(top.pair14_mask))):
        for (a, b), mm in zip(idx, m):
            if mm > 0:
                skip.add((min(int(a), int(b)), max(int(a), int(b))))
    pairs = []
    for ai in range(coupled.size):
        for bi in range(ai + 1, coupled.size):
            a, b = int(coupled[ai]), int(coupled[bi])
            if (a, b) not in skip:
                pairs.append((a, b))
    if not pairs:
        return (np.zeros((1, 2), np.int32), np.zeros((1,), np.float32))
    return (np.asarray(pairs, np.int32),
            np.ones((len(pairs),), np.float32))


def intramol_recip_compensation(x, box, top, idx, mask, couple_strength,
                                ewald_beta):
    """+k qq erf(beta r)/r (1 - c^2) over intramolecular non-excluded pairs.

    Restores these pairs to full strength: direct space already treats them
    at full strength (both atoms coupled => pair factor 1), but the
    reciprocal sum scaled them by c^2.
    """
    i, j = idx[:, 0], idx[:, 1]
    dx = displacement(x[i], x[j], box)
    r = jnp.sqrt(jnp.maximum(jnp.sum(dx * dx, axis=-1), 1e-4))
    qq = top.charges[i] * top.charges[j]
    c2 = couple_strength * couple_strength
    e = COULOMB_CONST * qq * jax.lax.erf(ewald_beta * r) / r * (1.0 - c2)
    return jnp.sum(e * mask)
