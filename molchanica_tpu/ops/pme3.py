"""SPME reciprocal space v3: order-6 splines + matmul-DFT, all-MXU.

Improvements over ops/pme2.py (measured on v5e, 25k atoms, 63 A box):
- Order-6 B-splines let the mesh drop from 64^3 (order 4, 1.0 A spacing)
  to 48^3 (1.3 A) at equal Ewald accuracy: the dense spreading contraction
  cost scales as A*Kx*Ky*Kz, so this alone is a ~4x FLOP cut.
- jnp.fft.fftn on TPU lowers to a slow generic path at these sizes; a 3D
  DFT of a 48^3 mesh is only ~0.1 GFLOP as three [K,K] matmul passes, so
  the transform is done as explicit cos/sin contractions on the MXU. Only
  |S|^2 is needed (energy quadrature), never an inverse transform.
- The per-chunk dense (Wy (x) Wz) outer-product panel is the main HBM
  traffic; chunk=1024 keeps it ~9 MB so it stays pipelined.

Forces come from jax.grad: every op in the chain is a matmul or an
elementwise polynomial, so the backward pass is matmuls too.

Energy convention matches ops/pme.py (tin-foil boundary, k=0 dropped,
net-charge background correction); validated in tests/test_pme3.py against
the exact plane-wave sum.

Reference parity: the ewald crate's cuFFT SPME path (SURVEY §2.1 "SPME
reciprocal-space electrostatics"; /root/reference Cargo.toml:101-102).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COULOMB_CONST
from .pme import good_fft_size


def default_grid6(box_extent, beta: float = None, spacing: float = 1.3,
                  k_rtol: float = 1e-6):
    """Mesh for order-6 splines (coarser than the order-4 1.0 A rule).

    Two constraints: (a) spacing <= ~1.3 A for the spline interpolation
    error, (b) the mesh Nyquist must cover the reciprocal Gaussian tail,
    K >= L * k_cut / pi with k_cut = 2 beta sqrt(ln(1/k_rtol)) — the
    binding constraint at large beta (short direct-space cutoffs)."""
    box = np.asarray(box_extent, np.float64)
    kmin = np.zeros(3)
    if beta is not None:
        k_cut = 2.0 * float(beta) * math.sqrt(math.log(1.0 / k_rtol))
        kmin = box * k_cut / math.pi
    return tuple(good_fft_size(max(16, int(math.ceil(b / spacing)),
                                   int(math.ceil(km))))
                 for b, km in zip(box, kmin))


def bspline_weights(t, order: int):
    """Cardinal B-spline weights M_order(t+k), k=0..order-1, for t in [0,1).

    Contribution of an atom with fractional offset t to grid points
    floor(u)-k. Cox-de Boor recurrence, traced (polynomial in t on the
    fixed knot intervals, so autodiff gives the analytic derivative)."""
    k = jnp.arange(order, dtype=t.dtype)
    u = t[..., None] + k                       # in [k, k+1)
    M = jnp.maximum(1.0 - jnp.abs(u - 1.0), 0.0)      # M_2
    for n in range(3, order + 1):
        Mm1 = jnp.concatenate(
            [jnp.zeros_like(M[..., :1]), M[..., :-1]], axis=-1)
        M = (u * M + (n - u) * Mm1) / (n - 1)
    return M


def bspline_weights_and_derivs(t, order: int):
    """(M_order(t+k), dM_order(t+k)/dt) for k=0..order-1.

    dM_n(u)/du = M_{n-1}(u) - M_{n-1}(u-1): both operands are exactly the
    inputs of the final Cox-de Boor step, so the derivative is one subtract
    on the penultimate iterate (used by the custom-VJP force pass)."""
    k = jnp.arange(order, dtype=t.dtype)
    u = t[..., None] + k
    M = jnp.maximum(1.0 - jnp.abs(u - 1.0), 0.0)      # M_2
    for n in range(3, order + 1):
        Mm1 = jnp.concatenate(
            [jnp.zeros_like(M[..., :1]), M[..., :-1]], axis=-1)
        Mnew = (u * M + (n - u) * Mm1) / (n - 1)
        if n == order:
            return Mnew, M - Mm1
        M = Mnew
    raise AssertionError("order must be >= 3")


def _mn_integer_nodes(order: int) -> np.ndarray:
    """M_order(j) for j = 1..order-1 (host numpy Cox-de Boor)."""
    u = np.arange(1, order, dtype=np.float64)
    M = np.maximum(1.0 - np.abs(u - 1.0), 0.0)          # M_2
    for n in range(3, order + 1):
        Mm1 = np.concatenate([[0.0], M[:-1]])           # M_{n-1}(u-1)
        M = (u * M + (n - u) * Mm1) / (n - 1)
    return M


def _bspline_b2_n(K: int, order: int) -> np.ndarray:
    """|b(m)|^2 Euler exponential-spline factors for one axis.

    b(m) = [sum_{j=0}^{order-2} M_order(j+1) exp(2 pi i m j / K)]^-1
    (same convention as ops/pme._bspline_b2, generalized in order)."""
    nodes = _mn_integer_nodes(order)                    # M(1)..M(order-1)
    m = np.arange(K)
    denom = np.zeros(K, np.complex128)
    for j in range(order - 1):
        denom += nodes[j] * np.exp(2j * np.pi * m * j / K)
    return 1.0 / np.maximum(np.abs(denom) ** 2, 1e-12)


def _axis_weights(u, K, order):
    """Dense [A, K] spreading matrix for one axis from fractional coords."""
    u0 = jnp.floor(u)
    t = u - u0
    w = bspline_weights(t, order)                # [A, order]
    base = u0.astype(jnp.int32)
    offs = jnp.arange(order, dtype=jnp.int32)
    idx = jnp.mod(base[:, None] - offs[None, :], K)      # [A, order]
    grid_iota = jnp.arange(K, dtype=jnp.int32)
    onehot = (idx[:, :, None] == grid_iota[None, None, :])
    return jnp.sum(jnp.where(onehot, w[:, :, None], 0.0), axis=1)  # [A, K]


def _axis_weights_d(u, K, order):
    """Dense ([A, K] weights, [A, K] d/du weights) for one axis."""
    u0 = jnp.floor(u)
    t = u - u0
    w, dw = bspline_weights_and_derivs(t, order)         # [A, order] each
    base = u0.astype(jnp.int32)
    offs = jnp.arange(order, dtype=jnp.int32)
    idx = jnp.mod(base[:, None] - offs[None, :], K)
    grid_iota = jnp.arange(K, dtype=jnp.int32)
    onehot = (idx[:, :, None] == grid_iota[None, None, :])
    W = jnp.sum(jnp.where(onehot, w[:, :, None], 0.0), axis=1)
    dW = jnp.sum(jnp.where(onehot, dw[:, :, None], 0.0), axis=1)
    return W, dW


def _dft_mats(K: int, dtype):
    m = np.arange(K)
    ang = -2.0 * np.pi * np.outer(m, m) / K
    return (jnp.asarray(np.cos(ang), dtype),
            jnp.asarray(np.sin(ang), dtype))


def make_pme3_recip_fn(grid_shape, beta, order: int = 6,
                       dtype=jnp.float32, chunk: int = 1024,
                       panel_dtype=None, custom_grad: bool = False):
    """Build recip(x, q_eff, box) -> E_recip, differentiable in x and q_eff.

    Grid geometry fixed at build; the influence function tracks the live box
    (barostat-safe).

    panel_dtype=jnp.bfloat16 runs the dense spreading contraction (the
    dominant HBM traffic: the [chunk, Ky*Kz] outer-product panel) on the MXU
    in bf16 with f32 accumulation. The panel entries are B-spline weight
    products in [0, 1]; bf16's ~4e-3 relative rounding on them perturbs the
    reciprocal energy/forces by ~1e-4 relative of the recip term — below the
    PME discretization error itself at this grid — while halving the panel
    traffic and using the MXU's native input width.

    custom_grad=True installs an analytic VJP for x and q_eff (recomputes
    the spreading panels in the backward pass instead of storing them as
    residuals). CONTRACT: the box cotangent is ZERO under custom_grad —
    never differentiate the box through this path (the barostats use
    finite differences; use custom_grad=False for any analytic-virial
    experiment)."""
    Kx, Ky, Kz = grid_shape
    b2 = (_bspline_b2_n(Kx, order)[:, None, None]
          * _bspline_b2_n(Ky, order)[None, :, None]
          * _bspline_b2_n(Kz, order)[None, None, :])
    b2 = jnp.asarray(b2, dtype)
    mx = jnp.asarray(np.fft.fftfreq(Kx) * Kx, dtype)
    my = jnp.asarray(np.fft.fftfreq(Ky) * Ky, dtype)
    mz = jnp.asarray(np.fft.fftfreq(Kz) * Kz, dtype)
    Cx, Sx = _dft_mats(Kx, dtype)
    Cy, Sy = _dft_mats(Ky, dtype)
    Cz, Sz = _dft_mats(Kz, dtype)
    acc_dtype = jnp.promote_types(dtype, jnp.float32)

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
            wx = _axis_weights(us[:, 0], Kx, order) * qs[:, None]
            wy = _axis_weights(us[:, 1], Ky, order)
            wz = _axis_weights(us[:, 2], Kz, order)
            P = (wy[:, :, None] * wz[:, None, :]).reshape(chunk, Ky * Kz)
            if panel_dtype is not None:
                P = P.astype(panel_dtype)
                wx = wx.astype(panel_dtype)
            Qc = jax.lax.dot_general(
                wx, P, (((0,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)            # [Kx, Ky*Kz]
            return Q + Qc

        Q = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((Kx, Ky * Kz), acc_dtype))
        return Q.reshape(Kx, Ky, Kz)

    def dft3_complex(QR, QI):
        """Complex 3D transform with kernel e^{-2pi i m g / K} per axis
        (the matrices are symmetric, so this is also the k->g adjoint)."""
        pet = dict(preferred_element_type=acc_dtype)
        if QI is None:
            R = jnp.einsum("xa,ayz->xyz", Cx, QR, **pet)
            I = jnp.einsum("xa,ayz->xyz", Sx, QR, **pet)
        else:
            R = jnp.einsum("xa,ayz->xyz", Cx, QR, **pet) \
                - jnp.einsum("xa,ayz->xyz", Sx, QI, **pet)
            I = jnp.einsum("xa,ayz->xyz", Sx, QR, **pet) \
                + jnp.einsum("xa,ayz->xyz", Cx, QI, **pet)
        R2 = jnp.einsum("yb,xbz->xyz", Cy, R, **pet) \
            - jnp.einsum("yb,xbz->xyz", Sy, I, **pet)
        I2 = jnp.einsum("yb,xbz->xyz", Cy, I, **pet) \
            + jnp.einsum("yb,xbz->xyz", Sy, R, **pet)
        R3 = jnp.einsum("zc,xyc->xyz", Cz, R2, **pet) \
            - jnp.einsum("zc,xyc->xyz", Sz, I2, **pet)
        I3 = jnp.einsum("zc,xyc->xyz", Cz, I2, **pet) \
            + jnp.einsum("zc,xyc->xyz", Sz, R2, **pet)
        return R3, I3

    def _infl(box):
        kx = 2.0 * jnp.pi * mx / box[0]
        ky = 2.0 * jnp.pi * my / box[1]
        kz = 2.0 * jnp.pi * mz / box[2]
        k2 = (kx[:, None, None] ** 2 + ky[None, :, None] ** 2
              + kz[None, None, :] ** 2)
        k2_safe = jnp.where(k2 == 0.0, 1.0, k2)
        infl = 4.0 * jnp.pi / k2_safe * jnp.exp(
            -k2_safe / (4.0 * beta * beta))
        return jnp.where(k2 == 0.0, 0.0, infl) * b2

    def _energy_parts(x, q_eff, box):
        grid = spread(x, q_eff, box)
        R3, I3 = dft3_complex(grid, None)
        infl = _infl(box)
        vol = box[0] * box[1] * box[2]
        e = (COULOMB_CONST / (2.0 * vol)) * jnp.sum(
            infl * (R3 * R3 + I3 * I3))
        qtot = jnp.sum(q_eff)
        e = e - COULOMB_CONST * jnp.pi / (2.0 * beta * beta * vol) \
            * qtot * qtot
        return e, (R3, I3, infl)

    def recip_plain(x, q_eff, box):
        return _energy_parts(x, q_eff, box)[0]

    if not custom_grad:
        return recip_plain

    # ---- opt-in analytic VJP (FastSim hot path) --------------------------
    # Reverse-mode through the chunked spread loop makes XLA store every
    # per-chunk [chunk, Ky*Kz] panel as a residual (~300 MB at 25k atoms):
    # measured 3.3 ms of a 4.5 ms value_and_grad. The analytic pass below
    # computes the classic PME force contraction instead — phi = adjoint
    # transform of infl * S, then per-chunk matmuls against the same panels,
    # recomputed rather than stored. Cotangents: exact for x and q_eff;
    # box gets ZEROS (no caller differentiates the box — the barostat uses
    # finite differences; MdSim's autodiff paths use custom_grad=False).
    @jax.custom_vjp
    def recip(x, q_eff, box):
        return recip_plain(x, q_eff, box)

    def recip_fwd(x, q_eff, box):
        e, (R3, I3, infl) = _energy_parts(x, q_eff, box)
        return e, (x, q_eff, box, infl * R3, infl * I3)

    def recip_bwd(res, e_bar):
        x, q_eff, box, DR, DI = res
        vol = box[0] * box[1] * box[2]
        alpha = COULOMB_CONST / (2.0 * vol)
        # dE/dQ_g = 2 alpha Re(sum_k infl S_k e^{-i theta}) with the SAME
        # symmetric kernel matrices; Re((DR+iDI)* (C+iS)) = DR C + DI S
        # = Re(transform(conj(D)))
        phi, _ = dft3_complex(DR, -DI)
        phi = (2.0 * alpha) * phi                      # [Kx, Ky, Kz]
        phi_flat = phi.reshape(Kx, Ky * Kz)
        n = x.shape[0]
        n_chunks = -(-n // chunk)
        n_pad = n_chunks * chunk
        xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        qp = jnp.pad(q_eff, (0, n_pad - n))
        Ks = jnp.asarray([Kx, Ky, Kz], x.dtype)
        u = xp / box * Ks
        scale = Ks / box                               # du/dx per axis

        def body(c, acc):
            gx_acc, gq_acc = acc
            us = jax.lax.dynamic_slice(u, (c * chunk, 0), (chunk, 3))
            qs = jax.lax.dynamic_slice(qp, (c * chunk,), (chunk,))
            wx, dwx = _axis_weights_d(us[:, 0], Kx, order)
            wy, dwy = _axis_weights_d(us[:, 1], Ky, order)
            wz, dwz = _axis_weights_d(us[:, 2], Kz, order)
            P = (wy[:, :, None] * wz[:, None, :]).reshape(chunk, Ky * Kz)
            phi_p = phi_flat
            if panel_dtype is not None:
                # mirror the fwd spread: cast BOTH dot operands so the bwd
                # runs the same mixed-precision model as the fwd
                P = P.astype(panel_dtype)
                phi_p = phi_flat.astype(panel_dtype)
            # Gx[a, kx] = sum_yz P[a, yz] phi[kx, yz]
            Gx = jax.lax.dot_general(
                P, phi_p, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype)      # [chunk, Kx]
            # T1[a, ky, kz] = sum_kx wx[a, kx] phi[kx, ky, kz]
            wx_p = wx.astype(panel_dtype) if panel_dtype is not None else wx
            T1 = jax.lax.dot_general(
                wx_p, phi_p, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype
            ).reshape(chunk, Ky, Kz)
            Ty = jnp.sum(T1 * wz[:, None, :], axis=2)          # [chunk, Ky]
            Tz = jnp.sum(T1 * wy[:, :, None], axis=1)          # [chunk, Kz]
            gx = qs * jnp.sum(dwx * Gx, axis=1) * scale[0]
            gy = qs * jnp.sum(dwy * Ty, axis=1) * scale[1]
            gz = qs * jnp.sum(dwz * Tz, axis=1) * scale[2]
            gq = jnp.sum(wx * Gx, axis=1)                      # psi_a
            g3 = jnp.stack([gx, gy, gz], axis=1)
            gx_acc = jax.lax.dynamic_update_slice(
                gx_acc, g3.astype(x.dtype), (c * chunk, 0))
            gq_acc = jax.lax.dynamic_update_slice(
                gq_acc, gq.astype(q_eff.dtype), (c * chunk,))
            return gx_acc, gq_acc

        gx_all, gq_all = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.zeros((n_pad, 3), x.dtype), jnp.zeros((n_pad,),
                                                       q_eff.dtype)))
        qtot = jnp.sum(q_eff)
        dq_bg = -COULOMB_CONST * jnp.pi / (beta * beta * vol) * qtot
        # Cotangents must carry the PRIMAL dtypes: under jax_enable_x64 the
        # incoming e_bar can be f64 (e.g. an f64 energy accumulation on top
        # of f32 coordinates) and the products would promote, tripping
        # custom_vjp's aval check. Cast back explicitly.
        x_bar = (e_bar * gx_all[:n]).astype(x.dtype)
        q_bar = (e_bar * (gq_all[:n] + dq_bg)).astype(q_eff.dtype)
        return x_bar, q_bar, jnp.zeros_like(box)

    recip.defvjp(recip_fwd, recip_bwd)
    return recip
