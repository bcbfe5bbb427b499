"""Smooth particle-mesh Ewald (SPME) reciprocal-space electrostatics.

TPU-native replacement for the reference's cuFFT-backed SPME (the external
`ewald` crate, /root/reference/Cargo.toml:31,101-102): order-4 cardinal
B-spline charge spreading -> jnp.fft.fftn -> influence function -> energy.
Forces come from jax.grad through the whole pipeline (the gradient of
scatter-spreading is gather-interpolation — exactly the analytic SPME force,
derived automatically).

Energy (tin-foil boundary, k=0 dropped):
  E = C/(2V) * sum_{k!=0} 4 pi / k^2 * exp(-k^2/(4 beta^2)) |S(k)|^2
with S(k) = b1 b2 b3 * FFT(Q) the spline-interpolated structure factor.

A net-charge background correction -C pi/(2 beta^2 V) (sum q)^2 is included
so non-neutral (e.g. alchemically scaled) systems stay well-defined.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc as _erfc  # host-side only (beta solve)

from ..constants import COULOMB_CONST


def ewald_beta_for(cutoff: float, rtol: float = 1e-5) -> float:
    """Solve erfc(beta * rc) / rc = rtol * (1/rc)  =>  erfc(beta rc) = rtol."""
    lo, hi = 0.0, 10.0
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        if _erfc(mid * cutoff) > rtol:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def good_fft_size(n: int) -> int:
    """Smallest size >= n with factors {2,3,5} (XLA-friendly FFT sizes)."""
    while True:
        m = n
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        if m == 1:
            return n
        n += 1


def default_grid(box_extent, spacing: float = 1.0):
    return tuple(good_fft_size(max(16, int(math.ceil(b / spacing))))
                 for b in np.asarray(box_extent))


def bspline4_weights(t):
    """Order-4 cardinal B-spline weights M4(t+k), k=0..3, for t in [0,1).

    Contribution of an atom with fractional offset t to grid points
    floor(u), floor(u)-1, floor(u)-2, floor(u)-3 respectively.
    """
    t2 = t * t
    t3 = t2 * t
    w0 = t3 / 6.0
    w1 = (-3.0 * t3 + 3.0 * t2 + 3.0 * t + 1.0) / 6.0
    w2 = (3.0 * t3 - 6.0 * t2 + 4.0) / 6.0
    w3 = (1.0 - t) ** 3 / 6.0
    return jnp.stack([w0, w1, w2, w3], axis=-1)   # [..., 4]


def _bspline_b2(K: int, order: int = 4):
    """|b(m)|^2 Euler exponential-spline factors for one axis (host numpy)."""
    m = np.arange(K)
    # M_n at integer nodes 1..n-1 for order 4: M4(1)=1/6, M4(2)=4/6, M4(3)=1/6
    nodes = np.array([1.0 / 6.0, 4.0 / 6.0, 1.0 / 6.0])
    denom = np.zeros(K, np.complex128)
    for j, w in enumerate(nodes):
        denom += w * np.exp(2j * np.pi * m * j / K)
    b2 = 1.0 / np.maximum(np.abs(denom) ** 2, 1e-12)
    return b2


def spread_charges(x, q_eff, box, grid_shape):
    """Scatter B-spline-weighted charges onto the [Kx,Ky,Kz] mesh."""
    Kx, Ky, Kz = grid_shape
    Ks = jnp.asarray([Kx, Ky, Kz], x.dtype)
    u = x / box * Ks                     # fractional grid coords
    u0 = jnp.floor(u)
    t = u - u0                            # [N,3] in [0,1)
    w = bspline4_weights(t)               # [N,3,4]
    base = u0.astype(jnp.int32)           # contributes to base - k, k=0..3
    offs = jnp.arange(4, dtype=jnp.int32)
    idx = (base[:, :, None] - offs[None, None, :])  # [N,3,4]
    Ki = jnp.asarray([Kx, Ky, Kz], jnp.int32)
    idx = jnp.mod(idx, Ki[None, :, None])
    # outer product of the three axis weights -> [N,4,4,4]
    w3 = (w[:, 0, :, None, None] * w[:, 1, None, :, None]
          * w[:, 2, None, None, :])
    flat = (idx[:, 0, :, None, None] * (Ky * Kz)
            + idx[:, 1, None, :, None] * Kz
            + idx[:, 2, None, None, :])            # [N,4,4,4]
    grid = jnp.zeros((Kx * Ky * Kz,), x.dtype)
    grid = grid.at[flat.reshape(-1)].add(
        (q_eff[:, None, None, None] * w3).reshape(-1))
    return grid.reshape(Kx, Ky, Kz)


def make_pme_recip_fn(top, cfg, box_extent):
    """Build recip(x, box, couple) -> E_recip (differentiable).

    Grid size is fixed at build time from the initial box (barostat box
    changes re-use the same mesh; the influence function tracks the live
    box). Delegates to the order-6 matmul-DFT SPME (ops/pme3.py) so both
    engines (MdSim and FastSim) share ONE reciprocal-space implementation
    and cross-engine energies agree to spline-interpolation accuracy.
    """
    from .pme3 import make_pme3_recip_fn

    grid_shape = cfg.pme_grid or default_grid(box_extent)
    beta = ewald_beta_for(cfg.coulomb_cutoff, cfg.ewald_rtol)
    recip3 = make_pme3_recip_fn(grid_shape, beta, order=6,
                                dtype=jnp.dtype(cfg.dtype))

    charges = top.charges * top.atom_mask
    cm = top.couple_mask

    def recip(x, box, couple):
        q_eff = charges * (1.0 - cm * (1.0 - couple))
        return recip3(x, q_eff, box)

    return recip
