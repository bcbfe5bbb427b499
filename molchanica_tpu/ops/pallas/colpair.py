"""Column-pair direct-space force kernel — the TPU performance core (v2).

TPU-native replacement for the reference's CUDA pair kernels
(/root/reference/src/cuda/util.cu lj_force_v2/coulomb_force), designed from
measured v5e characteristics rather than translated:

- XLA gathers (~2.4 ns/row) and scatters are two orders of magnitude too slow
  for per-step neighbor gathering, so the state lives SORTED by (xy-column,
  z): atoms binned into xy columns of width >= 2/3*(rc+skin) and z-ordered
  within each column. Every j-neighborhood is then a set of <= 9 contiguous
  index ranges (the 3x3 column window, z-cropped), read in the kernel as
  128-lane-aligned dynamic slices of a property-major [8, N] array. NO
  gather, NO scatter, NO ghost copies: periodic shifts are per-window-entry
  (+-L per axis) applied to the j-tile in registers.
- One grid program = one i-cluster of 16 sorted atoms (2 f32 vregs). The
  window entry list (built at rebuild time in XLA, reused for K steps with a
  skin) streams through SMEM; each entry is one [16, 128] pair tile: i-atoms
  on sublanes (broadcast [16,1]), j-atoms on lanes ([1,128] slices).
- Forces accumulate center-side only (both directions are separate tiles),
  energies are half-summed. Per-pair math avoids VPU division entirely
  (measured 26x an fma): rsqrt + a Chebyshev fit of erfc(x)*exp(x^2)
  (coefficients solved at build time, |rel err| < 1e-6 over the window).
- Per-column padding to multiples of 16 keeps clusters column-pure, so each
  cluster's window is exactly its column's 3x3 neighborhood.

The exclusion / 1-4 subtraction path (`pairlist_colpair_energy`) uses
bit-identical arithmetic so the window-minus-subtraction decomposition stays
consistent to float32 roundoff.
"""
from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import COULOMB_CONST

# Atoms per i-cluster (one grid program). Smaller clusters tighten each
# cluster's z-bbox (fewer dead pair slots) at the cost of more programs and
# more SMEM window rows. Env knob for on-chip sweeps; must be a multiple
# of 8 and divide into 128-slot padding cleanly.
import os as _os
ICL = int(_os.environ.get("MOLCHANICA_ICL", "64"))
ZBITS = 14        # z quantization bits in the sort key
W_MAX = 27        # legacy default (rings=1: 9 cols x 3 z-ranges); the
#                   live table width is plan.w_max (ring-dependent)
_TWO_OVER_SQRT_PI = 2.0 / math.sqrt(math.pi)

# r^2 floor (A^2): pairs closer than this (only possible mid-clash during
# equilibration, or excluded intramolecular pairs) are evaluated at the
# clamped distance. The subtraction path applies the SAME clamp.
R2_MIN = 0.25
# Alchemical softcore (only compiled into has_alch kernels; all terms are
# exactly 0.0 / 1.0 for non-alchemical pairs, so the math below is bitwise
# neutral at alch == 1 and the exclusion-subtraction cancellation survives).
# LJ: Beutler form, matching ops/nonbonded.py lj_softcore_energy —
#   inv = s6 / (alpha (1-cpl) s6 + 1);  V = 4 eps cpl (inv^2 - inv).
# Coulomb: r^2-softcore on the 1/r prefactor only (the erfc argument keeps
# the real distance; erfc <= 1 there) —
#   V = cpl kqq erfc(beta r) / sqrt(r^2 + alpha max(sig^2, floor) (1-cpl)).
# The sigma^2 floor covers zero-sigma hydrogens (GROMACS sc-sigma analog).
# Without this the linear endpoint diverges: round-5 chip TI showcase
# measured <dH/dl> = -48905 at lambda=1 (water overlapping the ghost
# solute at the C1 LJ clamp) vs ~8 at lambda=0.
SC_ALPHA = 0.5
SC_SIG2_MIN = 9.0
# LJ distances are additionally floored at SIG_CLAMP * sigma_ij: excluded
# intramolecular pairs sit at ~0.3 sigma where r^-12 reaches ~1e7 and the
# f32 window-minus-subtraction cancellation would leave O(1) kcal/mol noise.
#
# The clamp is C1-SMOOTH (quadratic blend over [_S2_LO, _S2_HI] in s^2
# space), NOT a hard min. History: a hard clamp makes the force
# DISCONTINUOUS at the boundary, and the kernel and the exclusion-
# subtraction path compute r^2 through different f32 op orders — any pair
# whose distance distribution has density AT the boundary occasionally
# rounds to opposite sides of the kink in the two paths, leaving the full
# LJ-wall force uncancelled for one step. At 0.45 sigma the C-C bond
# (1.526 A = 0.447 sigma) sat on the boundary; moving it to 0.40 landed it
# exactly on the amide C-N bond (1.335 A = 0.4006 sigma_CN) — a +-130,000
# kcal/mol/A mega-kick every few hundred steps at 25k sites (root cause of
# the round-3 "explodes at step ~350-440" instability, pinned by exact-
# state bisection: carried force on one C/N pair = the full boundary LJ
# wall, equal-and-opposite, while fresh re-evaluation was normal). With
# the quadratic blend the force tapers continuously to zero across a band
# ~1e5 ulps wide, so a one-ulp r^2 disagreement between the two paths
# costs O(ulp * dF/dr2) ~ 1e-1 kcal/mol/A instead of the full wall.
# Energy: LJ below _S2_LO, capped at _S2_MAX above _S2_HI, C1 in between.
# Forces remain exactly -grad(E) everywhere in BOTH paths.
SIG_CLAMP = 0.40
_S2_MAX = 1.0 / (SIG_CLAMP * SIG_CLAMP)
_S2_BLEND = 0.0625               # relative half-width of the C1 blend band
_S2_LO = _S2_MAX * (1.0 - _S2_BLEND)
_S2_HI = _S2_MAX * (1.0 + _S2_BLEND)
_S2_W = _S2_HI - _S2_LO


def _s2_clamped(s2_raw):
    """C1 soft cap of s^2 = (sigma/r)^2 at _S2_MAX: identity below _S2_LO,
    quadratic blend on [_S2_LO, _S2_HI], constant _S2_MAX above. Returns
    (s2_eff, d s2_eff / d s2_raw). Shared by the Pallas kernel and the
    pairlist subtraction path so excluded-pair forces cancel to roundoff
    WITHOUT requiring bit-identical branch decisions."""
    u = jnp.clip(s2_raw - _S2_LO, 0.0, _S2_W)
    s2 = jnp.minimum(s2_raw, _S2_HI) - u * u * (0.5 / _S2_W)
    gp = 1.0 - u * (1.0 / _S2_W)
    return s2, gp


def erfcx_cheb_coeffs(xmax: float, deg: int = None,
                      tol: float = None) -> np.ndarray:
    """Fit g(x) = erfc(x) * exp(x^2) on [0, xmax] as a plain polynomial
    (Chebyshev-node least squares). Horner-evaluated in the kernel.

    The degree is chosen AT PLAN TIME from a hard relative-error bound
    (default 1e-6 — the per-pair fit error amplifies ~3-4x into the
    summed Coulomb energy, and the BASELINE per-term gate is 1e-4 with
    tests at 2e-5; round-4 shipped a fixed deg=8 default whose 7.4e-5
    fit error broke that gate). MOLCHANICA_ERFCX_DEG forces a degree for
    sweeps; MOLCHANICA_ERFCX_TOL adjusts the bound."""
    env = os.environ.get("MOLCHANICA_ERFCX_DEG", "auto")
    if deg is None and env not in ("auto", ""):
        deg = int(env)
    if tol is None:
        tol = float(os.environ.get("MOLCHANICA_ERFCX_TOL", "1e-6"))
    from numpy.polynomial import chebyshev as C
    from scipy.special import erfc
    nodes = np.cos(np.pi * (np.arange(1024) + 0.5) / 1024)
    x = 0.5 * (nodes + 1.0) * xmax
    g = erfc(x) * np.exp(x * x)

    def fit_deg(d):
        cheb = C.Chebyshev.fit(x, g, d, domain=[0.0, xmax], w=1.0 / g)
        poly = cheb.convert(kind=np.polynomial.Polynomial)
        c = np.asarray(poly.coef, np.float64)
        fit = np.polynomial.polynomial.polyval(x, c)
        return c, float((np.abs(fit - g) / np.abs(g)).max())

    if deg is not None:                     # forced degree (sweep knob)
        c, err = fit_deg(deg)
        assert err < 1e-3, f"erfcx fit rel err {err:.2e}"
        return c
    for d in range(6, 17):
        c, err = fit_deg(d)
        if err < tol:
            return c
    raise AssertionError(
        f"erfcx fit cannot reach tol {tol:.1e} on [0, {xmax:.3f}] "
        f"by degree 16 (last err {err:.2e})")


def coulomb_kpoly_coeffs(xmax: float, tol: float = None) -> np.ndarray:
    """Force-only Coulomb kernel polynomial: fit
        K(x) = erfc(x)/2 + x e^{-x^2} / sqrt(pi),   x = beta*r in [0, xmax]
    so the per-pair force coefficient is dc = -kqq * K(beta r) / r^3 —
    ONE polynomial replaces the erfcx Horner + exp + two-term combine
    (~9 VPU ops/slot off the Coulomb force path). K is entire and bounded,
    so an ABSOLUTE-error fit is well-conditioned everywhere including the
    bonded-pair r (the u = r^2 table variant was tried and diverges: the
    1/u^3/2 spike at the left edge needs degree ~40+).

    Coefficients are a power series in t = 2x/xmax - 1 (f32 Horner in raw
    x at degree 12+ loses ~3 digits to cancellation; in t it is exact to
    ~1e-7). Energy kernels keep the erfcx path (they need erfc itself)."""
    if tol is None:
        tol = float(os.environ.get("MOLCHANICA_KPOLY_TOL", "5e-6"))
    from numpy.polynomial import chebyshev as C
    from scipy.special import erfc
    nodes = np.cos(np.pi * (np.arange(1024) + 0.5) / 1024)
    x = 0.5 * (nodes + 1.0) * xmax
    k = 0.5 * erfc(x) + x * np.exp(-x * x) / np.sqrt(np.pi)
    t32 = (2.0 * x / xmax - 1.0).astype(np.float32)
    for d in range(8, 19):
        ch = C.Chebyshev.fit(x, k, d, domain=[0.0, xmax])
        c = C.cheb2poly(ch.coef)
        # validate the f32 Horner the kernel will actually run
        g = np.full_like(t32, np.float32(c[-1]))
        for cv in c[-2::-1].astype(np.float32):
            g = g * t32 + cv
        if np.abs(g.astype(np.float64) - k).max() < tol:
            return np.asarray(c, np.float64)
    raise AssertionError(f"K-poly fit cannot reach {tol:.1e} by degree 18")


@dataclass(frozen=True)
class ColPlan:
    """Static geometry for the column sort + window kernel."""
    nx: int
    ny: int
    wx: float                 # column width (A), from the PLAN-time box
    wy: float
    lz: float
    n_sorted: int             # padded sorted-slot count (multiple of 128)
    n_base: int               # base (original-order) atom count incl. padding
    cutoff: float             # force cutoff rc (A)
    skin: float
    beta: float               # Ewald splitting parameter
    erfcx_coeffs: Tuple[float, ...]
    # force-only Coulomb K-polynomial (coulomb_kpoly_coeffs; power series
    # in t = 2*beta*r/xmax - 1) + its xmax; empty = use the erfcx path
    kpoly_coeffs: Tuple[float, ...] = ()
    kpoly_xmax: float = 0.0
    # molecule-blocked binning margin: rigid-solvent sites inherit their
    # O's sort key (so each water is a contiguous 3/4-slot block), which
    # places a site's key up to r_blob from its true position. Window
    # SELECTION therefore reaches rcw + r_blob (the kernel still masks by
    # the true rc^2).
    r_blob: float = 0.0
    # window ring radius in columns: the (2*rings+1)^2 xy neighborhood,
    # disc-culled. rings=1 (classic 3x3, columns >= reach wide) measured
    # BEST on chip at 25k sites: narrower columns shrink the xy window but
    # inflate each 64-atom cluster's z-span (span = ICL/(rho*col_area)),
    # and pair slots went UP (86 -> 101 -> 129M for 1 / 2,1 / 2,2 rings).
    # Kept as a validated option for other density/box regimes.
    rings: int = 1
    # offsets within the reach disc, as (dx, dy) pairs (static cull)
    offsets: Tuple[Tuple[int, int], ...] = tuple(
        (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1))

    @property
    def n_cols(self) -> int:
        return self.nx * self.ny

    @property
    def n_clusters(self) -> int:
        return self.n_sorted // ICL

    @property
    def rc_w(self) -> float:
        return self.cutoff + self.skin

    @property
    def rc_wb(self) -> float:
        return self.cutoff + self.skin + self.r_blob

    @property
    def w_max(self) -> int:
        """Window-entry table width: up to 3 z-ranges per in-disc column."""
        return 3 * len(self.offsets)


def plan_columns(box_extent, cutoff: float, beta: float, n_atoms_real: int,
                 n_base: int, skin: float = 1.2,
                 r_blob: float = 0.0, rings: int = None) -> ColPlan:
    """Choose the column grid.

    rings=1 (classic): width >= rc+skin+2*r_blob — the selection reach on
    j-O keys is rcwb = rc+skin+r_blob, and a blocked i-site can sit up to
    r_blob OUTSIDE its block's column, so the 3x3 window covers the cutoff
    sphere only if each column is at least rcwb + r_blob wide.

    rings=R>1: columns ~(rcwb+r_blob)/R wide with a (2R+1)^2 window whose
    out-of-disc corners are culled statically. Same coverage guarantee:
    a column at offset d is needed only if its gap distance
    max(|d|-1,0)*w is below the reach. Falls back to R-1 when the box
    cannot fit 2R+1 columns. Per-axis rings ("RX,RY") keep one axis wide
    so a 64-atom cluster's z-span stays short (narrowing BOTH axes at
    ICL=64 makes clusters ~16 A tall and slots go UP — measured).
    Env default: MOLCHANICA_RINGS (e.g. "1", "2", or "2,1")."""
    if rings is None:
        rings = os.environ.get("MOLCHANICA_RINGS", "1")
    if isinstance(rings, str):
        parts = [int(v) for v in rings.split(",")]
        rx, ry = (parts[0], parts[0]) if len(parts) == 1 else parts[:2]
    elif isinstance(rings, tuple):
        rx, ry = rings
    else:
        rx = ry = int(rings)
    box = np.asarray(box_extent, np.float64)
    rcw = cutoff + skin + r_blob
    reach = rcw + r_blob
    while rx > 1 and int(box[0] / (reach / rx)) < 2 * rx + 1:
        rx -= 1
    while ry > 1 and int(box[1] / (reach / ry)) < 2 * ry + 1:
        ry -= 1
    nx = max(int(box[0] / (reach / rx)), 1)
    ny = max(int(box[1] / (reach / ry)), 1)
    assert nx >= 3 and ny >= 3 and box[2] >= 2 * rcw - 1e-9, \
        f"box {box} too small for colpair at cutoff {cutoff}"
    rings = max(rx, ry)
    # static disc cull: offset (dx, dy) can contain an in-reach j only if
    # the gap between the i column and the j column is below the reach
    wx = float(box[0] / nx)
    wy = float(box[1] / ny)
    offs = []
    for dx in range(-rx, rx + 1):
        for dy in range(-ry, ry + 1):
            gx = max(abs(dx) - 1, 0) * wx
            gy = max(abs(dy) - 1, 0) * wy
            if gx * gx + gy * gy < reach * reach:
                offs.append((dx, dy))
    n_cols = nx * ny
    # capacity: real atoms + per-column pad-to-ICL (the padded total can
    # never exceed this by construction: sum(ceil(c_i/ICL)*ICL) <= n + ICL*n_cols)
    cap = n_atoms_real + ICL * n_cols
    n_sorted = ((cap + 127) // 128) * 128
    # r2 is clamped to [R2_MIN, rc^2] before the erfc evaluation (out-of-range
    # pairs are masked afterwards), so the fit domain is exactly [0, beta*rc].
    xmax = float(beta) * cutoff + 1e-3
    coeffs = tuple(float(v) for v in erfcx_cheb_coeffs(xmax))
    kcoeffs = tuple(float(v) for v in coulomb_kpoly_coeffs(xmax))
    return ColPlan(nx=nx, ny=ny, wx=wx, wy=wy, lz=float(box[2]),
                   n_sorted=n_sorted, n_base=n_base,
                   cutoff=float(cutoff), skin=float(skin), beta=float(beta),
                   erfcx_coeffs=coeffs, kpoly_coeffs=kcoeffs,
                   kpoly_xmax=xmax, r_blob=float(r_blob),
                   rings=int(rings), offsets=tuple(offs))


# ---------------------------------------------------------------------------
# Rebuild: sort into padded column runs + build the window entry table.
# All-XLA, jitted by the caller; runs every `neighbor_rebuild_every` steps.
# ---------------------------------------------------------------------------

def make_sort_fn(plan: ColPlan):
    """sort(x_base_order, atom_mask, owner=None, role=None) ->
    (perm [S] int32 (base ids; n_base = dummy), keys [S] int32,
    col_start [n_cols+1], overflow int32).

    perm[s] = base-order atom id occupying sorted slot s; dummy slots point
    at row n_base (callers must append a far-away dummy row when gathering).

    Molecule blocking: with `owner` ([n] int32, self-index for free atoms),
    each atom inherits its owner's (column, z-bin) key, so a rigid solvent
    molecule's sites share one key. Blocking then follows from SORT
    STABILITY: jnp.argsort is stable, and the input layout is always
    blocked (identity at init, output of the previous rebuild after), so
    equal-key members keep their (O, H1, H2[, M]) order and whole blocks
    stay contiguous — even when several molecules collide in one z-bin
    (common for lattice-packed boxes). No tie-break bits: role bits would
    INTERLEAVE colliding molecules by site rank.
    """
    nx, ny = plan.nx, plan.ny
    S = plan.n_sorted
    n_base = plan.n_base
    n_cols = plan.n_cols
    zmax = (1 << ZBITS) - 1

    def sort(x, box, atom_mask, owner=None):
        u = x / box
        u = u - jnp.floor(u)
        cx = jnp.minimum((u[:, 0] * nx).astype(jnp.int32), nx - 1)
        cy = jnp.minimum((u[:, 1] * ny).astype(jnp.int32), ny - 1)
        zb = jnp.minimum((u[:, 2] * (zmax + 1)).astype(jnp.int32), zmax)
        col = cx * ny + cy
        if owner is not None:
            col = col[owner]
            zb = zb[owner]
        real = atom_mask > 0
        col = jnp.where(real, col, n_cols)          # pads sort to the end
        key = (col << ZBITS) | jnp.where(real, zb, 0)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)  # [n_base]
        col_sorted = col[order]
        n_real = jnp.sum(real.astype(jnp.int32))
        # per-column ranges among the real prefix
        col_start_real = jnp.searchsorted(
            col_sorted, jnp.arange(n_cols + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        cnt = col_start_real[1:] - col_start_real[:-1]
        pcnt = ((cnt + ICL - 1) // ICL) * ICL
        col_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(pcnt).astype(jnp.int32)])
        overflow = jnp.maximum(col_start[-1] - S, 0)
        # slot of sorted-real rank r: col_start[c] + (r - col_start_real[c])
        r = jnp.arange(n_base, dtype=jnp.int32)
        c_of = jnp.clip(col_sorted, 0, n_cols - 1)
        slot = col_start[c_of] + (r - col_start_real[c_of])
        valid = (r < n_real)
        slot = jnp.where(valid, jnp.clip(slot, 0, S - 1), S)  # pads -> sink
        perm = jnp.full((S + 1,), n_base, jnp.int32)
        perm = perm.at[slot].set(jnp.where(valid, order, n_base))
        perm = perm[:S]
        # sorted keys incl. pad slots (pad key = column end sentinel)
        slot_col = jnp.searchsorted(
            col_start[1:], jnp.arange(S, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        key_sorted = jnp.full((S + 1,), (n_cols << ZBITS), jnp.int32)
        key_sorted = key_sorted.at[slot].set(
            jnp.where(valid, key[order], (n_cols << ZBITS)))
        key_sorted = key_sorted[:S]
        pad_key = (jnp.minimum(slot_col, n_cols - 1) << ZBITS) | zmax
        key_sorted = jnp.where(perm == n_base, pad_key, key_sorted)
        return perm, key_sorted, col_start, overflow.astype(jnp.int32)

    return sort


def make_anchor_sort_fn(plan: ColPlan, anchor_ids, sizes, atom_mask_base):
    """Molecule-anchor column sort: argsort over ANCHORS (one key per
    molecule block / free atom) instead of per-site keys, then expand each
    anchor to its `size` consecutive slots. Blocking is by construction —
    no stability argument needed — and the argsort shrinks ~3x for water
    systems (XLA TPU sort measured 6.5 ms at 26k keys vs ~2 ms at 9k).

    Static args (base order): anchor_ids [A] int (first site of each
    block), sizes [A] int (3/4 for waters, 1 otherwise), atom_mask_base.
    Returns sort(x_base, box) -> (perm [S] base ids (n_base = dummy),
    key_sorted [S], col_start [n_cols+1], overflow).
    """
    nx, ny = plan.nx, plan.ny
    S = plan.n_sorted
    n_base = plan.n_base
    n_cols = plan.n_cols
    zmax = (1 << ZBITS) - 1
    aid_np = np.asarray(anchor_ids, np.int64)
    sz_np = np.asarray(sizes, np.int64)
    msk_np = np.asarray(atom_mask_base)[aid_np] > 0
    aid = jnp.asarray(aid_np.astype(np.int32))
    sz = jnp.asarray(np.where(msk_np, sz_np, 0).astype(np.int32))
    msk = jnp.asarray(msk_np)
    max_sz = int(sz_np.max()) if sz_np.size else 1

    def sort(x_base, box):
        xa = x_base[aid]
        u = xa / box
        u = u - jnp.floor(u)
        cx = jnp.minimum((u[:, 0] * nx).astype(jnp.int32), nx - 1)
        cy = jnp.minimum((u[:, 1] * ny).astype(jnp.int32), ny - 1)
        zb = jnp.minimum((u[:, 2] * (zmax + 1)).astype(jnp.int32), zmax)
        col = jnp.where(msk, cx * ny + cy, n_cols)
        key = (col << ZBITS) | jnp.where(msk, zb, 0)
        order = jnp.argsort(key).astype(jnp.int32)
        key_s = key[order]
        col_s = col[order]
        size_s = sz[order]
        base_s = aid[order]
        atom_rank = jnp.cumsum(size_s) - size_s          # exclusive [A]
        total = atom_rank[-1] + size_s[-1]
        col_first = jnp.searchsorted(
            col_s, jnp.arange(n_cols + 1, dtype=jnp.int32)).astype(jnp.int32)
        atom_rank_ext = jnp.concatenate([atom_rank, total[None]])
        atoms_before = atom_rank_ext[col_first]          # [n_cols+1]
        cnt = atoms_before[1:] - atoms_before[:-1]
        pcnt = ((cnt + ICL - 1) // ICL) * ICL
        col_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(pcnt).astype(jnp.int32)])
        overflow = jnp.maximum(col_start[-1] - S, 0)
        c_of = jnp.clip(col_s, 0, n_cols - 1)
        slot_a = col_start[c_of] + (atom_rank - atoms_before[c_of])
        valid = col_s < n_cols
        slot_col = jnp.searchsorted(
            col_start[1:], jnp.arange(S, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        pad_key = (jnp.minimum(slot_col, n_cols - 1) << ZBITS) | zmax
        perm = jnp.full((S + 1,), n_base, jnp.int32)
        key_sorted = jnp.concatenate(
            [pad_key, jnp.zeros((1,), jnp.int32)])
        for k in range(max_sz):
            m = valid & (k < size_s)
            sl = jnp.where(m, jnp.clip(slot_a + k, 0, S - 1), S)
            perm = perm.at[sl].set(jnp.where(m, base_s + k, n_base))
            key_sorted = key_sorted.at[sl].set(key_s)
        return perm[:S], key_sorted[:S], col_start, overflow.astype(jnp.int32)

    return sort


def make_window_fn(plan: ColPlan, triangular: bool = False,
                   cross_j_size: int = None, per_slice_k: int = 0):
    """windows(x_sorted, keys_sorted, box, atom_mask_sorted)
    -> (wl [NC, 3*W_MAX] int32, nw [NC] int32, overflow int32).

    cross_j_size=S_j: CROSS variant (species-split solute pass) — cluster
    bounding boxes come from this plan's (subset) array, but slot ranges
    are computed over a SEPARATE master j-array of S_j slots whose sorted
    keys/mask arrive as extra arguments: windows(xs, keys, box, mask_s,
    col_start, keys_j, mask_j). No triangular clamp (the kernel's gid
    ordering mask dedups same-set pairs).

    Each entry is (lo, hi, shift_code): a [lo, hi) SLOT RANGE (up to 27 per
    cluster: 9 columns x 3 z-ranges) plus the packed periodic x/y/z shift
    the kernel adds to the j-tile (code = (sx+1) | (sy+1)<<2 | (sz+1)<<4, s in
    {-1,0,1} box lengths). Baking the full shift per entry is EXACT
    min-image for all in-cutoff pairs (column width >= rcw, nx,ny >= 3 and
    lz >= 2*rcw by plan_columns), so the kernel does NO per-pair min-image
    at all (x/y: 6 VPU ops, z: 4 VPU ops per pair saved). The z digit comes
    from the wrap ranges (main = 0; a wrap range reads the opposite end of
    the column with the image baked in). Ranges may OVERLAP: two entries
    covering the same slot carry different images, and with every box edge
    > 2*rc at most one image of a pair lies inside the cutoff — the other
    is masked by r2 < rc2, so no pair is ever double-counted. The kernel
    iterates the 128-lane slices of a range internally, so range length
    never limits the table.

    triangular=True clamps ranges to slots >= the cluster start: with the
    kernel's gid > i_slot diagonal mask and j-side accumulation (Newton's
    third law over the sequential TPU grid), every unordered pair is
    evaluated exactly once — half the pair math of the symmetric table.
    """
    nx, ny = plan.nx, plan.ny
    n_cols = nx * ny
    NC = plan.n_clusters
    S = plan.n_sorted
    W = plan.w_max // 3            # in-disc column offsets
    # selection reach: keys of blocked solvent sites are O-based, so the
    # window must include every j whose KEY position (its O) lies within
    # rcw + r_blob of the cluster; the kernel masks by the true rc^2.
    rcw = plan.rc_wb
    zmax = (1 << ZBITS) - 1

    dxdy = list(plan.offsets)

    HB = 8                      # window-range z quantization (256 bins)
    SH = ZBITS - HB
    NB = 1 << HB

    def windows(xs, keys, box, mask_s, col_start,
                keys_j=None, mask_j=None):
        lz = box[2]
        wx = box[0] / nx
        wy = box[1] / ny
        xc = xs.reshape(NC, ICL, 3)
        mc = mask_s.reshape(NC, ICL) > 0
        any_valid = mc.any(axis=1)
        # Range construction via a per-(column, z-bin) cumulative slot
        # table: lo/hi of any bin interval is one cheap table gather.
        # HB=8 coarsens boundaries by Lz/256 (~0.25 A) per side — a few
        # extra slots per range, nothing more. The table itself is ONE
        # vectorized searchsorted of the bucket boundaries into the
        # (already key-sorted) per-slot buckets — the earlier scatter-add
        # histogram serialized ~S read-modify-writes on TPU (~6 ms at 25k
        # sites); this is ~0.1 ms. Pads get the per-column sentinel bin NB,
        # so real-bin boundaries exclude them and hi clips to the column's
        # real run.
        if cross_j_size is None:
            keys_j = keys
            mask_j = mask_s
        real_s = mask_j > 0
        colk = jnp.clip(keys_j >> ZBITS, 0, n_cols - 1)
        bin8 = (keys_j & zmax) >> SH
        bucket = colk * (NB + 1) + jnp.where(real_s, bin8, NB)
        cum_flat = jnp.searchsorted(
            bucket, jnp.arange(n_cols * (NB + 1) + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        big = jnp.asarray(1e30, xs.dtype)
        # cluster bounding box (rebuild-time positions; rcw = rc + skin
        # absorbs drift until the next rebuild)
        xlo_c = jnp.min(jnp.where(mc, xc[:, :, 0], big), axis=1)
        xhi_c = jnp.max(jnp.where(mc, xc[:, :, 0], -big), axis=1)
        ylo_c = jnp.min(jnp.where(mc, xc[:, :, 1], big), axis=1)
        yhi_c = jnp.max(jnp.where(mc, xc[:, :, 1], -big), axis=1)
        zmin_c = jnp.min(jnp.where(mc, xc[:, :, 2], big), axis=1)
        zmax_c = jnp.max(jnp.where(mc, xc[:, :, 2], -big), axis=1)
        # cluster column from any valid member's key
        key_c = keys.reshape(NC, ICL)
        col_c = (key_c[:, 0] >> ZBITS)          # pads share the column key
        col_c = jnp.clip(col_c, 0, nx * ny - 1)
        cx = col_c // ny
        cy = col_c - cx * ny
        cl_start = jnp.arange(NC, dtype=jnp.int32) * ICL

        def zq(z):
            u = z / lz
            return jnp.clip((u * NB).astype(jnp.int32), 0, NB - 1)

        entries = []
        valids = []
        for dx, dy in dxdy:
            jx = cx + dx
            jy = cy + dy
            jxw = jnp.where(jx < 0, jx + nx, jnp.where(jx >= nx, jx - nx, jx))
            jyw = jnp.where(jy < 0, jy + ny, jnp.where(jy >= ny, jy - ny, jy))
            # periodic shift of the stored j coords into i's frame:
            # stored = unwrapped - s*L  =>  kernel adds s*L to j
            sx = jnp.where(jx < 0, -1, jnp.where(jx >= nx, 1, 0))
            sy = jnp.where(jy < 0, -1, jnp.where(jy >= ny, 1, 0))
            jcol = jxw * ny + jyw
            # xy distance from the cluster bbox to the (unwrapped) column
            # rectangle tightens the z-reach: zr = sqrt(rcw^2 - d_xy^2)
            jxlo = jx.astype(xs.dtype) * wx
            jxhi = jxlo + wx
            jylo = jy.astype(xs.dtype) * wy
            jyhi = jylo + wy
            dxm = jnp.maximum(jnp.maximum(jxlo - xhi_c, xlo_c - jxhi), 0.0)
            dym = jnp.maximum(jnp.maximum(jylo - yhi_c, ylo_c - jyhi), 0.0)
            d2 = dxm * dxm + dym * dym
            zr2 = rcw * rcw - d2
            in_reach = zr2 > 0.0
            zr = jnp.sqrt(jnp.maximum(zr2, 0.0))
            zlo_c = zmin_c - zr
            zhi_c = zmax_c + zr
            # up to two extra z-ranges: main [zlo, zhi] clipped to the box,
            # plus wrap ranges reading the opposite end of the column with
            # the z-image BAKED into the entry (sz digit): wrap=1 reads the
            # column TOP for images below z=0 (stored = unwrapped + lz,
            # s = -1); wrap=2 reads the bottom for images above lz (s = +1).
            # Baking sz makes the entry shift a FULL exact min-image, so
            # the kernel needs no per-pair z round (4 VPU ops/pair), AND
            # overlapping ranges are harmless: two entries covering the
            # same slot carry different images, and with every box edge
            # > 2*rc at most one image of a pair is inside the cutoff —
            # the other is masked by r2 < rc2. (This also removes the old
            # disjointness clamping and its thin-box clip hazard, where a
            # saturated main range silently dropped the wrap images.)
            for wrap in (0, 1, 2):   # 0 = main, 1 = low wrap, 2 = high wrap
                if wrap == 0:
                    blo = zq(jnp.maximum(zlo_c, 0.0))
                    bhi = zq(jnp.minimum(zhi_c, lz))
                    ok = (zhi_c > jnp.maximum(zlo_c, 0.0)) \
                        & any_valid & in_reach
                elif wrap == 1:      # zlo < 0: neighbors at the column top
                    blo = zq(zlo_c + lz)
                    bhi = jnp.full_like(blo, NB - 1)
                    ok = (zlo_c < 0.0) & any_valid & in_reach
                else:                # zhi > Lz: neighbors at the bottom
                    bhi = zq(zhi_c - lz)
                    blo = jnp.zeros_like(bhi)
                    ok = (zhi_c > lz) & any_valid & in_reach
                ok = ok & (bhi >= blo)
                szd = (1, 0, 2)[wrap]
                code = (sx + 1) | ((sy + 1) << 2) | (szd << 4)
                entries.append((blo, bhi, code, jcol))
                valids.append(ok)
        blo_all = jnp.stack([jnp.clip(e[0], 0, NB - 1)
                             for e in entries], axis=1)        # [NC, 27]
        bhi_all = jnp.stack([jnp.clip(e[1], 0, NB - 1)
                             for e in entries], axis=1)
        sc_all = jnp.stack([e[2] for e in entries], axis=1)
        jcol_all = jnp.stack([e[3] for e in entries], axis=1)
        ok_all = jnp.stack(valids, axis=1)
        # bin interval -> slot range, one gather each from the cum table
        # (cum_flat holds ABSOLUTE slot indices; pads live in the per-column
        # sentinel bin NB, so real-bin boundaries clip to the real run)
        base = jcol_all * (NB + 1)
        lo = cum_flat[base + blo_all]
        hi = cum_flat[base + bhi_all + 1]
        if triangular:
            lo = jnp.maximum(lo, cl_start[:, None])
        good = ok_all & (hi > lo)
        lo_all = jnp.where(good, lo, 0)
        hi_all = jnp.where(good, hi, 0)
        sc_all = jnp.where(good, sc_all, 1 | (1 << 2) | (1 << 4))
        if per_slice_k:
            # Pre-split every range into 128-lane SLICE entries
            # (lo_s, hi_s, code): the kernel then runs ONE flat loop with
            # no per-range ceil-div / nested fori_loop — per-range scalar
            # overhead measured ~0.5 us on chip, ~45% of kernel time at
            # 25k sites (ranges avg only 1.8-2.9 slices).
            K = per_slice_k
            s0 = lo_all >> 7
            nsl = jnp.where(good, ((hi_all + 127) >> 7) - s0, 0)
            os_ = jnp.cumsum(nsl, axis=1) - nsl          # exclusive [NC,E]
            ns = (os_[:, -1] + nsl[:, -1]).astype(jnp.int32)
            kk = jnp.arange(K, dtype=jnp.int32)[None, None, :]
            sel = (kk >= os_[:, :, None]) & (kk < (os_ + nsl)[:, :, None])
            off = kk - os_[:, :, None]
            blk = s0[:, :, None] + off
            sel_i = sel.astype(jnp.int32)
            lo_k = jnp.sum(jnp.where(
                sel, jnp.maximum(lo_all[:, :, None], blk * 128), 0),
                axis=1)
            hi_k = jnp.sum(jnp.where(
                sel, jnp.minimum(hi_all[:, :, None], (blk + 1) * 128), 0),
                axis=1)
            sc_k = jnp.sum(sel_i * sc_all[:, :, None], axis=1)
            overflow = jnp.maximum(jnp.max(ns) - K, 0)
            wl = jnp.stack([lo_k, hi_k, sc_k], axis=2).reshape(
                good.shape[0], -1)                       # [NC, 3*K]
            return wl, jnp.minimum(ns, K), overflow.astype(jnp.int32)
        nw = jnp.sum(good, axis=1).astype(jnp.int32)
        W_ENT = plan.w_max
        overflow = jnp.maximum(jnp.max(nw) - W_ENT, 0)
        # compact valid entries to the front WITHOUT a per-row sort:
        # pos = rank of each valid entry; one-hot select into W_ENT slots
        pos = jnp.cumsum(good.astype(jnp.int32), axis=1) - 1   # [NC, 3W]
        kk = jnp.arange(W_ENT, dtype=jnp.int32)
        sel = (good[:, :, None]
               & (pos[:, :, None] == kk[None, None, :]))       # [NC,27,W]
        sel_i = sel.astype(jnp.int32)
        wl = jnp.stack([jnp.sum(sel_i * lo_all[:, :, None], axis=1),
                        jnp.sum(sel_i * hi_all[:, :, None], axis=1),
                        jnp.sum(sel_i * sc_all[:, :, None], axis=1)],
                       axis=2).reshape(good.shape[0], -1)      # [NC, 3*W_MAX]
        nw = jnp.minimum(nw, W_ENT)
        return wl, nw, overflow.astype(jnp.int32)

    return windows


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------

def _pair_tile(xi, yi, zi, qi, shi, sei, jx, jy, jz, jq, jsh, jse,
               rc2, beta, coeffs, want_energy, alch=None, zmi=None,
               jmask=None, skip_self_check=False, mode="full",
               kpoly=None):
    """[ICL, 128] pair math. Returns (coeff = dV/dr2 masked, e_lj, e_c,
    dx, dy, dz). `zmi` = (lz, 1/lz) enables in-tile minimum image on z
    (x/y images are baked into the window entries as exact column shifts;
    z cannot be, because a cluster's z-extent is unbounded).

    mode: 'full' = LJ + Coulomb; 'lj' / 'coul' skip the other half's math
    entirely (species-split kernels: in a 4-site water model the O carries
    only LJ and the H/M sites only charge, so the water-water pair work
    factors into a small pure-LJ kernel over O sites and a pure-Coulomb
    kernel over H/M sites — the dominant slot-count lever at 25k sites)."""
    dx = xi - jx
    dy = yi - jy
    dz = zi - jz
    if zmi is not None:
        lz, ilz = zmi
        dz = dz - lz * jnp.round(dz * ilz)
    r2 = dx * dx + dy * dy + dz * dz
    # the r2 > 0 self-pair guard is only needed by the SYMMETRIC table
    # (energies would count the clamped self-interaction); the triangular
    # path excludes the diagonal via its gid > islot run bound
    valid = (r2 < rc2) if skip_self_check else ((r2 < rc2) & (r2 > 1e-9))
    if jmask is not None:
        valid = valid & jmask
    r2s = jnp.clip(r2, R2_MIN, rc2)
    inv_r = jax.lax.rsqrt(r2s)
    inv_r2 = inv_r * inv_r

    # alchemical softcore scales (see SC_ALPHA docs): 1 - alch == 0 for
    # every non-alchemical pair, so a_lj = 0 / soft_c = 0 there and the
    # expressions below reduce bitwise to the plain path
    if alch is not None:
        sigsc = shi + jsh
        a_lj = SC_ALPHA * (1.0 - alch)
        soft_c = jnp.maximum(sigsc * sigsc, SC_SIG2_MIN) * a_lj
        inv_rc = jax.lax.rsqrt(r2s + soft_c)
    else:
        inv_rc = inv_r

    if mode != "coul":
        sig = shi + jsh                   # sigma_ij (inputs are sigma/2)
        eps4 = sei * jse                  # 4 eps_ij  (inputs are 2 sqrt(eps))
        if alch is not None:
            eps4 = eps4 * alch
        sig2 = sig * sig
        # C1 soft sigma clamp in s^2 space (division-free; _s2_clamped).
        # dV/dr2 = dV/ds2 * gp * ds2_raw/dr2, ds2_raw/dr2 = -s2_raw*inv_r2:
        # at gp=1, s2=s2_raw this is the classic (3 s6 - 6 s12)*inv_r2.
        s2_raw = sig2 * inv_r2
        s2, gp = _s2_clamped(s2_raw)
        s6 = s2 * s2 * s2
        if alch is not None:
            # Beutler: V = eps4 (inv^2 - inv), inv = s6/(a s6 + 1);
            # dV/dr2 = eps4 inv_r2 (gp s2_raw) s2^2 invd^2 (3 - 6 inv)
            invd = 1.0 / (a_lj * s6 + 1.0)
            s6 = s6 * invd
            dlj = eps4 * inv_r2 * (gp * s2_raw) * (s2 * s2) \
                * (invd * invd) * (3.0 - 6.0 * s6)
        else:
            dlj = eps4 * inv_r2 * (gp * s2_raw) * (s2 * s2) \
                * (3.0 - 6.0 * s6)
    else:
        dlj = 0.0

    if mode != "lj":
        kqq = qi * jq                     # inputs are q * sqrt(k_C)
        if alch is not None:
            kqq = kqq * alch
        if kpoly is not None and not want_energy:
            # force-only K-polynomial: dc = -kqq K(beta r)/r^3, one Horner
            # in t = 2 beta r / xmax - 1 (see coulomb_kpoly_coeffs) —
            # drops the exp + erfcx Horner + two-term combine
            kc, kxmax = kpoly
            t = (r2s * inv_r) * (2.0 * beta / kxmax) - 1.0
            kk = kc[-1]
            for c in kc[-2::-1]:
                kk = kk * t + c
            dc = -kqq * (kk * (inv_r2 * inv_r))
        else:
            x = beta * (r2s * inv_r)
            ex = jnp.exp(-x * x)
            g = coeffs[-1]
            for c in coeffs[-2::-1]:
                g = g * x + c
            erfc_v = g * ex
            if alch is not None:
                # d/dr2 of erfc(beta r) / r_sc, r_sc^2 = r^2 + soft_c
                # (erfc keeps the real r; soft_c == 0 -> plain values)
                dc = -kqq * ((0.5 * _TWO_OVER_SQRT_PI * beta)
                             * ex * inv_r * inv_rc
                             + 0.5 * erfc_v * inv_rc * inv_rc * inv_rc)
            else:
                dc = -kqq * inv_r2 * (0.5 * erfc_v * inv_r
                                      + (0.5 * _TWO_OVER_SQRT_PI * beta)
                                      * ex)
    else:
        dc = 0.0
    coeff = jnp.where(valid, dlj + dc, 0.0)
    if want_energy:
        # energies are gated EXPLICITLY (not left to compiler DCE: the
        # axon relay has miscompiled DCE'd kernel variants before)
        zero = jnp.zeros_like(coeff)
        if mode != "coul":
            s12 = s6 * s6
            e_lj = jnp.where(valid, eps4 * (s12 - s6), zero)
        else:
            e_lj = zero
        if mode != "lj":
            e_c = jnp.where(valid, kqq * erfc_v * inv_rc, zero)
        else:
            e_c = zero
        return coeff, e_lj, e_c, dx, dy, dz
    return coeff, None, None, dx, dy, dz


def _kernel(wl_ref, rows_ref, pT_ref, box_ref, o_ref, o2_ref=None, *,
            rc2, beta, coeffs, want_energy, n_lanes, has_alch,
            triangular=False, i_base=0, mode="full", cross=None,
            water_filter=None, per_slice=False, kpoly=None):
    """cross=(wlo, whi): CROSS kernel — i-rows are a separate (solute)
    array while pT is the full master array. Each unordered pair must be
    counted exactly once even though windows carry the full sphere:
    j-sites in the water gid range [wlo, whi) are always kept (water
    kernels never see solute, so this is the pair's only evaluation);
    other j (solute/ion) pairs are kept only when gj > gi — group ids are
    unique per non-water atom, giving a strict antisymmetric order (and
    dropping the self pair). Reaction forces accumulate into o2 over the
    master array like the triangular path.

    water_filter=(wlo, whi): species-split Q kernel — drop pairs where
    NEITHER side's group id lies in the water range. The Q subset holds
    water H/M sites plus all solute atoms; solute-solute pairs are fully
    evaluated by the L kernel (which also holds the solute), so the Q
    kernel must keep only pairs with at least one water site."""
    c = pl.program_id(0)
    crow = c - (c // 8) * 8      # row within this program's (8, W) wl block
    irow = rows_ref[:, :]                         # [ICL, 8] (blocked)
    xi = irow[:, 0:1]
    yi = irow[:, 1:2]
    zi = irow[:, 2:3]
    qi = irow[:, 3:4]
    shi = irow[:, 4:5]
    sei = irow[:, 5:6]
    cmi = irow[:, 6:7] if has_alch else None
    gi = irow[:, 7:8]            # exclusion-group id + 1 (0 = padded slot)

    lx = box_ref[0, 0]
    ly = box_ref[0, 1]
    lz = box_ref[0, 2]
    couple = box_ref[0, 3]

    nw = wl_ref[crow, 0]
    zero = jnp.zeros((ICL, n_lanes), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_lanes), 1)
    if triangular or cross is not None:
        # zero the whole-array j-side accumulator once (grid is sequential)
        @pl.when(c == 0)
        def _init():
            o2_ref[...] = jnp.zeros_like(o2_ref)
    if triangular:
        cl_base = i_base + c * ICL
        islot = cl_base + jax.lax.broadcasted_iota(
            jnp.int32, (ICL, 1), 0)

    def body(w, carry):
        # carry: (fx, fy, fz, elj, ec), each [ICL, n_lanes]
        lo = wl_ref[crow, 3 * w + 1]
        hi = wl_ref[crow, 3 * w + 2]
        code = wl_ref[crow, 3 * w + 3]
        # per-entry x/y/z shift: stored j = unwrapped - s*L with s decoded
        # from the entry; adding s*L reconstructs the unwrapped j, which
        # replaces ALL per-pair minimum image (x/y: 6 ops, z: 4 ops) with
        # three scalar adds per window entry. The z digit comes from the
        # wrap ranges (main = 0), which are exact: a range never mixes
        # wrapped and unwrapped z-images of in-cutoff pairs. Bitfield
        # packing ((s+1) in 2-bit lanes) decodes with shifts/ands — the
        # scalar-unit div/mod chains of the base-3 packing were part of a
        # measured ~0.5 us/window overhead.
        shx = ((code & 3) - 1).astype(jnp.float32) * lx
        shy = (((code >> 2) & 3) - 1).astype(jnp.float32) * ly
        shz = (((code >> 4) & 3) - 1).astype(jnp.float32) * lz
        s0 = lo // n_lanes
        if not per_slice:
            n_sl = (hi + n_lanes - 1) // n_lanes - s0

        def slice_body(s, carry2):
            fx, fy, fz, elj, ec = carry2
            start = pl.multiple_of((s0 + s) * n_lanes, n_lanes)
            gid = lane + start
            # explicit masking: run bounds + padded-slot sentinel rows +
            # exclusion groups (a rigid solvent molecule's sites share one
            # group id; ALL its intra pairs are excluded, so masking here
            # removes them from the direct sum entirely — no subtraction)
            gj = pT_ref[7:8, pl.ds(start, n_lanes)]
            # padded-slot sentinel rows need no mask of their own: they sit
            # at 1e6 A, so the r2 < rc2 cut removes them. Exclusion groups
            # (gj != gi) mask a rigid solvent molecule's intra pairs
            # directly — no subtraction path for water.
            if triangular:
                # strict upper triangle in slot order, folded into the run
                # lower bound: with the lo >= cluster-start window clamp,
                # every unordered pair is evaluated exactly once
                # (Newton's 3rd law in o2). The triangle applies ONLY to
                # the range overlapping this cluster's own slots: ranges
                # from other clusters were already ownership-filtered by
                # the table clamp, and in the SHARDED variant a halo range
                # can sit below the cluster in LOCAL coordinates while
                # being globally above it (ring seam) — a local gid>islot
                # test would wrongly drop those pairs (round-4 bug, caught
                # by the 25k parity test).
                own = (lo < cl_base + ICL) & (hi > cl_base)     # scalar
                lo_eff = jnp.where(own, jnp.maximum(islot + 1, lo), lo)
            else:
                lo_eff = lo
            if cross is not None:
                wlo, whi = cross
                keep = ((gj >= wlo) & (gj < whi)) | (gj > gi)
                jok = (gid >= lo_eff) & (gid < hi) & keep
            elif water_filter is not None:
                wlo, whi = water_filter
                is_wi = (gi >= wlo) & (gi < whi)        # [ICL, 1]
                is_wj = (gj >= wlo) & (gj < whi)        # [1, 128]
                jok = ((gid >= lo_eff) & (gid < hi) & (gj != gi)
                       & (is_wi | is_wj))
            else:
                jok = (gid >= lo_eff) & (gid < hi) & (gj != gi)
            jx = pT_ref[0:1, pl.ds(start, n_lanes)] + shx
            jy = pT_ref[1:2, pl.ds(start, n_lanes)] + shy
            jz = pT_ref[2:3, pl.ds(start, n_lanes)] + shz
            jq = pT_ref[3:4, pl.ds(start, n_lanes)]
            jsh = pT_ref[4:5, pl.ds(start, n_lanes)]
            jse = pT_ref[5:6, pl.ds(start, n_lanes)]
            alch = None
            if has_alch:
                cmj = pT_ref[6:7, pl.ds(start, n_lanes)]
                is_alch = cmi + cmj - 2.0 * cmi * cmj
                alch = 1.0 - is_alch * (1.0 - couple)
            coeff, e_lj, e_c, dx, dy, dz = _pair_tile(
                xi, yi, zi, qi, shi, sei, jx, jy, jz, jq, jsh, jse,
                rc2, beta, coeffs, want_energy, alch,
                zmi=None, jmask=jok,
                skip_self_check=triangular or cross is not None,
                mode=mode, kpoly=kpoly)
            c2 = 2.0 * coeff
            # (an MXU force-contraction variant — c2 @ pj^T dot_generals
            # instead of the fma chain — was built and A/B'd on chip in
            # round 4: it produced WRONG forces on hardware (rel 2.2e-1 vs
            # this path; correct in interpret mode) AND ran ~8% slower, so
            # it was removed. Small-K [ICL,128]x[3,128] dots neither
            # pipeline on the MXU nor lower reliably through Mosaic.)
            fx = fx - c2 * dx
            fy = fy - c2 * dy
            fz = fz - c2 * dz
            if triangular or cross is not None:
                # reaction on j: += 2 coeff d, reduced over i sublanes
                sl = pl.ds(start, n_lanes)
                o2_ref[0:1, sl] = o2_ref[0:1, sl] + jnp.sum(
                    c2 * dx, axis=0, keepdims=True)
                o2_ref[1:2, sl] = o2_ref[1:2, sl] + jnp.sum(
                    c2 * dy, axis=0, keepdims=True)
                o2_ref[2:3, sl] = o2_ref[2:3, sl] + jnp.sum(
                    c2 * dz, axis=0, keepdims=True)
            if want_energy:
                elj = elj + e_lj
                ec = ec + e_c
            return fx, fy, fz, elj, ec

        if per_slice:
            # flat slice table: each entry IS one 128-lane slice (lo/hi
            # pre-clipped to the slice at rebuild) — no inner loop
            return slice_body(0, carry)
        return jax.lax.fori_loop(0, n_sl, slice_body, carry)

    fx, fy, fz, elj, ec = jax.lax.fori_loop(
        0, nw, body, (zero, zero, zero, zero, zero))
    o_ref[:, 0:1] = jnp.sum(fx, axis=1, keepdims=True)
    o_ref[:, 1:2] = jnp.sum(fy, axis=1, keepdims=True)
    o_ref[:, 2:3] = jnp.sum(fz, axis=1, keepdims=True)
    # triangular/cross visit each unordered pair once
    ehalf = 1.0 if (triangular or cross is not None) else 0.5
    if want_energy:
        o_ref[:, 3:4] = ehalf * jnp.sum(elj, axis=1, keepdims=True)
        o_ref[:, 4:5] = ehalf * jnp.sum(ec, axis=1, keepdims=True)
    else:
        o_ref[:, 3:5] = jnp.zeros((ICL, 2), jnp.float32)


def make_colpair_direct_fn(plan: ColPlan, has_alch: bool,
                           want_energy: bool = True,
                           interpret: bool = False,
                           triangular: bool = False,
                           local_shape=None,
                           mode: str = "full",
                           cross=None,
                           water_filter=None,
                           per_slice_k: int = 0):
    """Build direct(rows, pT, wl, nw, box, couple) -> (F_sorted [S,3],
    e_lj, e_c).

    rows: [S, 8] f32 sorted atom rows (x, y, z, q*sqrt(kC), sigma/2,
          2*sqrt(eps), couple_mask, pad)
    pT:   [8, S] f32, the same transposed

    triangular=True pairs with make_window_fn(plan, triangular=True):
    each unordered pair is evaluated in exactly one tile (half the pair
    math); the reaction force accumulates into a whole-array [8, S] VMEM
    accumulator via read-modify-write, which is race-free because the TPU
    grid runs sequentially.

    local_shape=(nc_local, s_local, i_base): spatial-decomposition shard
    variant (parallel/spatial_colpair.py) — this device evaluates
    nc_local clusters whose i-rows are the [nc_local*ICL, 8] `rows` block
    sitting at slot offset i_base of the s_local-slot local j-array
    (own block + ppermuted halo blocks); window entries must be
    pre-converted to local slot coordinates. Forces return for the local
    j-array; halo parts are reduced back to their owners by the caller.

    mode: 'full' | 'lj' | 'coul' — species-split pair math (_pair_tile).

    cross=(wlo, whi, s_j): CROSS kernel for the solute x master pass of
    the species-split path — i-rows/wl come from the solute subset array
    (this plan), pT is the [8, s_j] master array, and window entries are
    master-slot ranges. Returns (f_i [NC*ICL, 3], f_react [s_j, 3], e_lj,
    e_c) with each unordered pair counted once (see _kernel docstring).
    """
    NC = plan.n_clusters
    S = plan.n_sorted
    if local_shape is not None:
        # sharded-shard variant (parallel/spatial_colpair.py): this device
        # owns NC local clusters whose i-rows sit at slot offset i_base of
        # a [s_j]-slot local j-array (own block + ppermuted halo blocks);
        # window entries arrive pre-converted to local coordinates.
        NC, S, i_base = local_shape
    else:
        i_base = 0
    if cross is not None:
        assert not triangular and local_shape is None
        wlo, whi, s_j = cross
        S = int(s_j)
        cross_k = (float(wlo), float(whi))
    else:
        cross_k = None
    rc2 = float(plan.cutoff) ** 2
    beta = float(plan.beta)
    coeffs = tuple(float(v) for v in plan.erfcx_coeffs)

    kpoly = None
    # has_alch: the K-polynomial folds erfc'/r^3 into ONE Horner, which
    # cannot express the softcore 1/r_sc prefactor — alchemical kernels
    # take the (slightly costlier) erfcx force branch instead
    if (not want_energy and mode != "lj" and not has_alch
            and plan.kpoly_coeffs
            and os.environ.get("MOLCHANICA_KPOLY", "1") == "1"):
        kpoly = (tuple(float(v) for v in plan.kpoly_coeffs),
                 float(plan.kpoly_xmax))
    kernel = functools.partial(
        _kernel, rc2=rc2, beta=beta, coeffs=coeffs,
        want_energy=want_energy, n_lanes=128, has_alch=has_alch,
        triangular=triangular, i_base=i_base, mode=mode, cross=cross_k,
        water_filter=(tuple(float(v) for v in water_filter)
                      if water_filter is not None else None),
        per_slice=bool(per_slice_k), kpoly=kpoly)

    # SMEM row width padded to a multiple of 8 words (alignment-safe);
    # per-slice tables (make_window_fn per_slice_k) are wider
    _W_ENT = per_slice_k if per_slice_k else plan.w_max
    _WL_W = ((3 * _W_ENT + 1 + 7) // 8) * 8

    # wl rows: [nw, entry_0 .. entry_{W_MAX-1}]; blocked 8 clusters per
    # SMEM block (Mosaic requires sublane-dim blocks divisible by 8)
    out_specs = pl.BlockSpec((ICL, 8), lambda c: (c, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((NC * ICL, 8), jnp.float32)
    if triangular or cross is not None:
        out_specs = [out_specs,
                     pl.BlockSpec((8, S), lambda c: (0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape, jax.ShapeDtypeStruct((8, S), jnp.float32)]
    grid_spec = pl.GridSpec(
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((8, _WL_W), lambda c: (c // 8, 0),
                         memory_space=pltpu.SMEM),          # nw | (lo,hi)*
            # i-cluster rows BLOCKED per program: a full-array [S, 8] VMEM
            # spec would be lane-padded to [S, 128] (~13 MB at 25k sites),
            # starving the kernel of VMEM; the block is one (ICL, 8) tile
            pl.BlockSpec((ICL, 8), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),          # rows (i side)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # pT (j side)
            pl.BlockSpec((1, 8), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),          # box/invbox/couple
        ],
        out_specs=out_specs,
    )

    pc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )

    def direct(rows, pT, wl, nw, box, couple):
        b32 = box.astype(jnp.float32)
        params = jnp.stack([
            b32[0], b32[1], b32[2], couple.astype(jnp.float32),
            1.0 / b32[0], 1.0 / b32[1], 1.0 / b32[2],
            jnp.zeros((), jnp.float32),
        ]).reshape(1, 8)
        wl_full = jnp.concatenate([nw.reshape(NC, 1), wl], axis=1)
        pad = _WL_W - wl_full.shape[1]
        if pad:
            wl_full = jnp.concatenate(
                [wl_full, jnp.zeros((NC, pad), jnp.int32)], axis=1)
        if cross is not None:
            out, o2 = pc(wl_full, rows, pT, params)
            # i-forces over the subset array; reactions over the master
            # j-array — merged by the caller (fast_engine split path)
            return out[:, :3], o2[:3].T, jnp.sum(out[:, 3]), \
                jnp.sum(out[:, 4])
        if triangular:
            out, o2 = pc(wl_full, rows, pT, params)
            if local_shape is not None:
                # shard variant: i-forces [NC*ICL, 3] and j-reactions over
                # the LOCAL j-array [s_local, 3] are reduced by the caller
                # (halo blocks are ppermuted back to their owners)
                return out[:, :3], o2[:3].T, jnp.sum(out[:, 3]), \
                    jnp.sum(out[:, 4])
            f = out[:, :3] + o2[:3].T
        else:
            out = pc(wl_full, rows, pT, params)
            f = out[:, :3]
        e_lj = jnp.sum(out[:, 3])
        e_c = jnp.sum(out[:, 4])
        return f, e_lj, e_c

    return direct


# ---------------------------------------------------------------------------
# Matching pair-list formula (for exclusion / 1-4 subtraction and testing).
# ---------------------------------------------------------------------------

def pairlist_colpair_energy(x, box, idx, mask, q_kc, sig_half, eps_2sqrt,
                            couple_mask, couple, plan: ColPlan,
                            lj_scale=1.0, coulomb_scale=1.0,
                            want_force=False):
    """(e_lj, e_c) over an explicit pair list with arithmetic matching the
    colpair kernel exactly (same rsqrt / poly-erfc / clamp), so subtracting
    it from the kernel's window sums cancels excluded pairs to f32 roundoff.
    Differentiable."""
    from ...ops.pbc import minimum_image

    beta = plan.beta
    coeffs = plan.erfcx_coeffs
    rc2 = plan.cutoff ** 2
    i, j = idx[:, 0], idx[:, 1]
    d = minimum_image(x[i] - x[j], box) if box is not None else x[i] - x[j]
    r2 = jnp.sum(d * d, axis=-1)
    valid = (r2 < rc2) & (r2 > 1e-9) & (mask > 0)
    r2s = jnp.clip(r2, R2_MIN, rc2)
    inv_r = jax.lax.rsqrt(r2s)
    inv_r2 = inv_r * inv_r
    sig = sig_half[i] + sig_half[j]
    eps4 = eps_2sqrt[i] * eps_2sqrt[j]
    cm_i, cm_j = couple_mask[i], couple_mask[j]
    is_alch = cm_i + cm_j - 2.0 * cm_i * cm_j
    cpl = 1.0 - is_alch * (1.0 - couple)
    eps4 = eps4 * cpl
    sig2 = sig * sig
    # alchemical softcore, mirroring _pair_tile's alch branch op-for-op
    # (a_lj and soft_c are exactly 0.0 for non-alchemical pairs, so the
    # plain-path values are reproduced bitwise and exclusion subtraction
    # still cancels to roundoff)
    a_lj = SC_ALPHA * (1.0 - cpl)
    soft_c = jnp.maximum(sig2, SC_SIG2_MIN) * a_lj
    inv_rc = jax.lax.rsqrt(r2s + soft_c)
    s2, _ = _s2_clamped(sig2 * inv_r2)         # same C1 clamp as the kernel
    s6 = s2 * s2 * s2
    invd = 1.0 / (a_lj * s6 + 1.0)             # Beutler 1/(a s6 + 1)
    s6 = s6 * invd
    s12 = s6 * s6
    e_lj = eps4 * (s12 - s6)
    kqq = q_kc[i] * q_kc[j] * cpl
    xx = beta * (r2s * inv_r)
    ex = jnp.exp(-xx * xx)
    g = coeffs[-1]
    for c in coeffs[-2::-1]:
        g = g * xx + c
    erfc_v = g * ex
    e_c = kqq * erfc_v * inv_rc
    zero = jnp.zeros_like(e_lj)
    return (jnp.sum(jnp.where(valid, e_lj, zero)) * lj_scale,
            jnp.sum(jnp.where(valid, e_c, zero)) * coulomb_scale)
