"""Mixing / solubility diagnostics over an MD snapshot.

Reference parity: src/properties/mixing_analysis.rs — scores how well a
set of solute molecules is mixed with solvent: multi-scale local-mixing
kernels (sigma 4/7/10 A), solute dispersion, contact-cluster aggregation
penalty. The reference accelerates with a Barnes-Hut octree on CPU; here
the same quantities are direct vectorized distance computations (the
TPU-idiomatic form at these sizes).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

KERNEL_SIGMAS_A = (4.0, 7.0, 10.0)
CONTACT_CUTOFF_A = 4.2
AGGREGATION_PENALTY_STRENGTH = 3.5


@dataclass
class SolubilityMixingDiagnostics:
    score: float
    raw_score: float
    local_mixing: float
    solute_dispersion: float
    mixture_score: float
    aggregation_factor: float
    aggregation_penalty: float
    largest_cluster_fraction: float
    contacted_fraction: float
    contact_pair_fraction: float


def _min_image(d, box):
    if box is None:
        return d
    return d - box * np.round(d / box)


def _clusters(solute_com: np.ndarray, box, cutoff: float):
    """Union-find contact clustering of solute molecules."""
    n = len(solute_com)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    n_contact_pairs = 0
    contacted = np.zeros(n, bool)
    for i in range(n):
        d = _min_image(solute_com[i + 1:] - solute_com[i], box)
        r = np.linalg.norm(d, axis=-1)
        for k in np.nonzero(r < cutoff)[0]:
            j = i + 1 + int(k)
            n_contact_pairs += 1
            contacted[i] = contacted[j] = True
            ra, rb = find(i), find(j)
            if ra != rb:
                parent[ra] = rb
    sizes = {}
    for i in range(n):
        r = find(i)
        sizes[r] = sizes.get(r, 0) + 1
    largest = max(sizes.values()) if sizes else 1
    return largest / max(n, 1), contacted.mean() if n else 0.0, \
        n_contact_pairs / max(n * (n - 1) / 2, 1)


def mixing_diagnostics(
    solute_com: np.ndarray,          # [M, 3] per-solute-molecule centers
    solvent_pos: np.ndarray,         # [W, 3] solvent heavy-atom positions
    box_extent: Optional[np.ndarray] = None,
) -> SolubilityMixingDiagnostics:
    """Score in [0, 1]: 1 = well-mixed/dispersed, 0 = phase-separated."""
    solute_com = np.asarray(solute_com, float)
    solvent_pos = np.asarray(solvent_pos, float)
    box = None if box_extent is None else np.asarray(box_extent, float)
    M = len(solute_com)
    vol = float(np.prod(box)) if box is not None else \
        float(np.ptp(solvent_pos, axis=0).prod() + 1e-9)
    rho_w = len(solvent_pos) / vol

    # local mixing: observed local solvent density around each solute vs
    # the bulk expectation, averaged over kernel scales
    mix_scales = []
    for sig in KERNEL_SIGMAS_A:
        loc = []
        norm = (2 * np.pi * sig * sig) ** 1.5
        for i in range(M):
            d = _min_image(solvent_pos - solute_com[i], box)
            r2 = np.sum(d * d, axis=-1)
            w = np.exp(-0.5 * r2 / (sig * sig))
            loc.append(w.sum() / (norm * rho_w + 1e-12))
        mix_scales.append(np.clip(np.mean(loc), 0.0, 1.5))
    local_mixing = float(np.clip(np.mean(mix_scales), 0.0, 1.0))

    # dispersion: mean nearest-neighbor solute distance vs the ideal-gas
    # expectation (0.554 * rho^{-1/3})
    if M > 1:
        nn = []
        for i in range(M):
            d = _min_image(np.delete(solute_com, i, axis=0)
                           - solute_com[i], box)
            nn.append(np.linalg.norm(d, axis=-1).min())
        expect = 0.554 * (vol / M) ** (1.0 / 3.0)
        solute_dispersion = float(np.clip(np.mean(nn) / expect, 0.0, 1.0))
    else:
        solute_dispersion = 1.0

    mixture_score = 0.5 * (local_mixing + solute_dispersion)

    largest_frac, contacted_frac, pair_frac = (
        _clusters(solute_com, box, CONTACT_CUTOFF_A) if M > 1
        else (1.0 / max(M, 1), 0.0, 0.0))
    aggregation_factor = float(np.clip(largest_frac, 0.0, 1.0))
    aggregation_penalty = AGGREGATION_PENALTY_STRENGTH * \
        max(aggregation_factor - 1.0 / max(M, 1), 0.0) ** 2

    raw = mixture_score - aggregation_penalty
    return SolubilityMixingDiagnostics(
        score=float(np.clip(raw, 0.0, 1.0)),
        raw_score=float(raw),
        local_mixing=local_mixing,
        solute_dispersion=solute_dispersion,
        mixture_score=float(mixture_score),
        aggregation_factor=aggregation_factor,
        aggregation_penalty=float(aggregation_penalty),
        largest_cluster_fraction=float(largest_frac),
        contacted_fraction=float(contacted_frac),
        contact_pair_fraction=float(pair_frac),
    )
