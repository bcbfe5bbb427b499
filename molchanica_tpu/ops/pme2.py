"""SPME reciprocal space v2: scatter-free B-spline spreading via matmuls.

XLA scatter-add on TPU measured ~10 ms for the 25k-atom spreading (it
serializes); this formulation reaches the same mesh through dense
one-hot/matmul contractions that run on the MXU:

    Q[gx, gy, gz] = sum_a (q_a Wx[a,gx]) Wy[a,gy] Wz[a,gz]
                  = sum_chunks  (Wy (x) Wz)^T  @  (q * Wx)        per chunk

with Wx/Wy/Wz the dense per-axis order-4 B-spline weight matrices (4
nonzeros per row, built by iota comparison — no scatter). Forces come from
jax.grad: the backward pass is the transposed matmul chain (= analytic SPME
interpolation), also scatter/gather-free.

Energy convention matches ops/pme.py (tin-foil boundary, k=0 dropped,
net-charge background correction); cross-checked in tests/test_pme2.py.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COULOMB_CONST
from .pme import _bspline_b2, bspline4_weights, default_grid, ewald_beta_for


def _axis_weights(u, K):
    """Dense [A, K] spreading matrix for one axis from fractional coords."""
    u0 = jnp.floor(u)
    t = u - u0
    w = bspline4_weights(t)                      # [A, 4]
    base = u0.astype(jnp.int32)
    offs = jnp.arange(4, dtype=jnp.int32)
    idx = jnp.mod(base[:, None] - offs[None, :], K)      # [A, 4]
    grid_iota = jnp.arange(K, dtype=jnp.int32)
    onehot = (idx[:, :, None] == grid_iota[None, None, :])
    return jnp.sum(jnp.where(onehot, w[:, :, None], 0.0), axis=1)  # [A, K]


def make_pme2_recip_fn(grid_shape, beta, dtype=jnp.float32, chunk=2048):
    """Build recip(x, q_eff, box) -> E_recip, differentiable in x and q_eff.

    The charge mesh is accumulated per atom chunk with an MXU contraction;
    grid geometry is fixed at build, the influence function tracks the live
    box (barostat-safe).
    """
    Kx, Ky, Kz = grid_shape
    b2 = (_bspline_b2(Kx)[:, None, None]
          * _bspline_b2(Ky)[None, :, None]
          * _bspline_b2(Kz)[None, None, :])
    b2 = jnp.asarray(b2, dtype)
    mx = jnp.asarray(np.fft.fftfreq(Kx) * Kx, dtype)
    my = jnp.asarray(np.fft.fftfreq(Ky) * Ky, dtype)
    mz = jnp.asarray(np.fft.fftfreq(Kz) * Kz, dtype)

    def spread(x, q_eff, box):
        n = x.shape[0]
        n_chunks = -(-n // chunk)
        n_pad = n_chunks * chunk
        xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        qp = jnp.pad(q_eff, (0, n_pad - n))
        Ks = jnp.asarray([Kx, Ky, Kz], x.dtype)
        u = xp / box * Ks

        def body(c, Q):
            us = jax.lax.dynamic_slice(u, (c * chunk, 0), (chunk, 3))
            qs = jax.lax.dynamic_slice(qp, (c * chunk,), (chunk,))
            wx = _axis_weights(us[:, 0], Kx) * qs[:, None]   # [A, Kx]
            wy = _axis_weights(us[:, 1], Ky)                 # [A, Ky]
            wz = _axis_weights(us[:, 2], Kz)                 # [A, Kz]
            P = (wy[:, :, None] * wz[:, None, :]).reshape(chunk, Ky * Kz)
            Qc = jax.lax.dot_general(
                wx, P, (((0,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)            # [Kx, Ky*Kz]
            return Q + Qc

        acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
        Q = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((Kx, Ky * Kz), acc_dtype))
        return Q.reshape(Kx, Ky, Kz)

    def recip(x, q_eff, box):
        grid = spread(x, q_eff, box)
        S = jnp.fft.fftn(grid)
        kx = 2.0 * jnp.pi * mx / box[0]
        ky = 2.0 * jnp.pi * my / box[1]
        kz = 2.0 * jnp.pi * mz / box[2]
        k2 = (kx[:, None, None] ** 2 + ky[None, :, None] ** 2
              + kz[None, None, :] ** 2)
        k2_safe = jnp.where(k2 == 0.0, 1.0, k2)
        vol = box[0] * box[1] * box[2]
        infl = 4.0 * jnp.pi / k2_safe * jnp.exp(
            -k2_safe / (4.0 * beta * beta))
        infl = jnp.where(k2 == 0.0, 0.0, infl) * b2
        e = (COULOMB_CONST / (2.0 * vol)) * jnp.sum(
            infl * (S.real ** 2 + S.imag ** 2))
        qtot = jnp.sum(q_eff)
        e = e - COULOMB_CONST * jnp.pi / (2.0 * beta * beta * vol) \
            * qtot * qtot
        return e

    return recip
