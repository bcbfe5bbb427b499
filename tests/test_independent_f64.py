"""Clean-room f64 per-term energy parity (the strongest external-parity
gate available in this environment).

The environment has no external MD package (no gromacs/sander/openmm), so
true cross-package numbers cannot be produced here. This test instead
re-implements every Amber functional form FROM THE PUBLISHED EQUATIONS in
straight f64 numpy — no imports from the engine's math — and pins the
engine's per-term energies of real molecules against it at 1e-4 relative
(BASELINE.md parity gate). It validates units, index conventions, 1-4
scaling, exclusion handling, and combining rules end to end; only the
parameter ASSIGNMENT layer is shared (validated separately by the
literature anchors in test_golden_external.py and the prmtop import
tests). Reference analog: --verify-mpnn golden checks
(/root/reference/src/main.rs:78-112) applied to MD energies.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from molchanica_tpu.constants import COULOMB_CONST
from molchanica_tpu.md.config import MdConfig
from molchanica_tpu.md.energy import make_energy_fn


def _independent_terms(top, x):
    """All Amber terms in f64 numpy from the Topology arrays alone."""
    x = np.asarray(x, np.float64)
    m = {}

    bi = np.asarray(top.bond_idx)
    bk = np.asarray(top.bond_k, np.float64)
    br = np.asarray(top.bond_r0, np.float64)
    d = x[bi[:, 0]] - x[bi[:, 1]]
    r = np.sqrt((d * d).sum(-1))
    m["bond"] = float(np.sum(bk * (r - br) ** 2))

    ai = np.asarray(top.angle_idx)
    ak = np.asarray(top.angle_k, np.float64)
    a0 = np.asarray(top.angle_theta0, np.float64)
    u = x[ai[:, 0]] - x[ai[:, 1]]
    v = x[ai[:, 2]] - x[ai[:, 1]]
    # padded rows are all-zero index triples with k=0: clamp the norms so
    # their 0/0 doesn't NaN the (zero-weighted) sum
    cos = (u * v).sum(-1) / np.maximum(
        np.linalg.norm(u, axis=-1) * np.linalg.norm(v, axis=-1), 1e-12)
    th = np.arccos(np.clip(cos, -1.0, 1.0))
    m["angle"] = float(np.sum(ak * (th - a0) ** 2))

    di = np.asarray(top.dihedral_idx)
    dk = np.asarray(top.dihedral_k, np.float64)
    dn = np.asarray(top.dihedral_n, np.float64)
    dp = np.asarray(top.dihedral_phase, np.float64)
    b1 = x[di[:, 1]] - x[di[:, 0]]
    b2 = x[di[:, 2]] - x[di[:, 1]]
    b3 = x[di[:, 3]] - x[di[:, 2]]
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    b2n = b2 / np.maximum(np.linalg.norm(b2, axis=-1, keepdims=True), 1e-12)
    phi = np.arctan2((np.cross(n1, n2) * b2n).sum(-1), (n1 * n2).sum(-1))
    m["dihedral"] = float(np.sum(dk * (1.0 + np.cos(dn * phi - dp))))

    q = np.asarray(top.charges, np.float64)
    sig = np.asarray(top.lj_sigma, np.float64)
    eps = np.asarray(top.lj_eps, np.float64)
    mask = np.asarray(top.atom_mask, np.float64)
    n = len(q)
    dm = x[:, None, :] - x[None, :, :]
    r2 = (dm * dm).sum(-1)
    np.fill_diagonal(r2, np.inf)
    pairm = np.outer(mask, mask)
    # remove exclusions (1-2, 1-3) and 1-4 pairs from the plain sum
    ei = np.asarray(top.excl_idx)
    em = np.asarray(top.excl_mask, np.float64)
    p4 = np.asarray(top.pair14_idx)
    p4m = np.asarray(top.pair14_mask, np.float64)
    for (i, j), w in zip(ei, em):
        if w > 0:
            pairm[i, j] = pairm[j, i] = 0.0
    for (i, j), w in zip(p4, p4m):
        if w > 0:
            pairm[i, j] = pairm[j, i] = 0.0
    r2 = np.where(pairm > 0, r2, np.inf)   # coincident padding atoms
    s = 0.5 * (sig[:, None] + sig[None, :])
    e4 = 4.0 * np.sqrt(np.outer(eps, eps))
    s6 = (s * s / r2) ** 3
    lj_full = 0.5 * np.sum(pairm * e4 * (s6 * s6 - s6))
    c_full = 0.5 * np.sum(pairm * COULOMB_CONST * np.outer(q, q)
                          / np.sqrt(r2))
    # scaled 1-4
    scee = np.asarray(top.pair14_scee, np.float64)
    scnb = np.asarray(top.pair14_scnb, np.float64)
    i4, j4 = p4[:, 0], p4[:, 1]
    d4 = x[i4] - x[j4]
    # padded rows are (0, 0) self-pairs with mask 0: clamp r2 away from 0
    r24 = np.maximum((d4 * d4).sum(-1), 1.0 * (p4m <= 0))
    s4 = 0.5 * (sig[i4] + sig[j4])
    e44 = 4.0 * np.sqrt(eps[i4] * eps[j4])
    s64 = (s4 * s4 / r24) ** 3
    # scee/scnb are stored as Amber DIVISORS (1.2 / 2.0)
    lj14 = np.sum(p4m * e44 * (s64 * s64 - s64) / scnb)
    c14 = np.sum(p4m * COULOMB_CONST * q[i4] * q[j4]
                 / np.sqrt(r24) / scee)
    m["lj"] = float(lj_full + lj14)
    m["coulomb"] = float(c_full + c14)
    return m


def _case(build):
    top, x0 = build
    cfg = MdConfig(dtype="float64")
    e_fn = make_energy_fn(top, cfg, method="allpairs")
    _, t = e_fn(jnp.asarray(x0, jnp.float64), None, jnp.asarray(1.0))
    ref = _independent_terms(top, x0)
    for k, v in ref.items():
        got = float(t[k])
        assert abs(got - v) <= 1e-4 * max(abs(v), 1.0), \
            f"{k}: engine {got} vs independent f64 {v}"


def test_terms_vs_independent_f64_ethanol():
    from molchanica_tpu.systems.testmols import build_ethanol
    _case(build_ethanol())


def test_terms_vs_independent_f64_peptide():
    from molchanica_tpu.molecules.peptide import prepare_peptide
    from molchanica_tpu.molecules.peptide_builder import build_peptide
    from molchanica_tpu.molecules.spec import assemble_system

    spec = prepare_peptide(build_peptide("ACF"))
    asys = assemble_system([spec])
    _case((asys.topology, asys.positions))
