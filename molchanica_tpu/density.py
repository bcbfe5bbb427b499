"""Electron density: structure-factor synthesis + map sampling.

Reference parity: src/reflection.rs — density_map_from_sf (reciprocal-grid
fill from Miller indices + inverse FFT, :564), DensityRect atom-region
cropping (:126) and the make_densities kernel (:243, the one live CUDA
kernel in the reference) which samples density at points near atoms.

TPU design: the FFT synthesis is jnp.fft.ifftn (XLA's native batched FFT)
and point sampling is a vectorized trilinear gather — both single fused
programs rather than a hand-scheduled kernel.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclass
class DensityMap:
    """Real-space density on a periodic grid (reference DensityMap)."""
    data: np.ndarray                 # [nx, ny, nz] x-fast logical order
    cell: Tuple[float, float, float] # orthorhombic cell lengths (A)
    origin: np.ndarray = field(default_factory=lambda: np.zeros(3))

    @property
    def dims(self):
        return self.data.shape

    @property
    def step(self):
        return np.asarray(self.cell) / np.asarray(self.data.shape)


def density_map_from_sf(h, k, l, amp=None, phase=None, re=None, im=None,
                        grid: Tuple[int, int, int] = None,
                        cell=(50.0, 50.0, 50.0)) -> DensityMap:
    """Synthesize a density map from structure factors
    (reference density_map_from_sf, reflection.rs:564).

    Provide either (amp, phase[rad]) or (re, im) per reflection. Hermitian
    mates are filled automatically so the synthesis is real.
    """
    import jax.numpy as jnp

    h = np.asarray(h, int)
    k = np.asarray(k, int)
    l = np.asarray(l, int)
    if re is None:
        re = np.asarray(amp) * np.cos(np.asarray(phase))
        im = np.asarray(amp) * np.sin(np.asarray(phase))
    if grid is None:
        n = int(2 * max(np.abs(h).max(), np.abs(k).max(),
                        np.abs(l).max()) + 2)
        grid = (n, n, n)
    nx, ny, nz = grid
    F = np.zeros(grid, np.complex64)
    u, v, w = h % nx, k % ny, l % nz
    F[u, v, w] = np.asarray(re) + 1j * np.asarray(im)
    u2, v2, w2 = (-h) % nx, (-k) % ny, (-l) % nz
    for i in range(len(h)):
        if (u2[i], v2[i], w2[i]) != (u[i], v[i], w[i]) and \
                F[u2[i], v2[i], w2[i]] == 0:
            F[u2[i], v2[i], w2[i]] = complex(re[i], -im[i])
    rho = np.asarray(jnp.real(jnp.fft.ifftn(jnp.asarray(F))))
    # scale: ifftn already divides by N (numpy convention) — the map is
    # in (sum F)/V-style units; normalize to unit cell volume
    vol = float(np.prod(cell))
    return DensityMap(data=rho * np.prod(grid) / vol, cell=tuple(cell))


def sample_density(dmap: DensityMap, points: np.ndarray) -> np.ndarray:
    """Trilinear periodic interpolation at Cartesian points — the
    make_densities analog (reflection.rs:243) as one vectorized gather."""
    import jax.numpy as jnp

    pts = (np.asarray(points, float) - dmap.origin) / dmap.step
    nx, ny, nz = dmap.dims
    data = jnp.asarray(dmap.data)

    f = jnp.asarray(pts)
    i0 = jnp.floor(f).astype(int)
    t = f - i0

    def at(di, dj, dk):
        idx = (i0 + jnp.asarray([di, dj, dk]))
        return data[idx[:, 0] % nx, idx[:, 1] % ny, idx[:, 2] % nz]

    c = 0.0
    for di in (0, 1):
        wx = (1 - t[:, 0]) if di == 0 else t[:, 0]
        for dj in (0, 1):
            wy = (1 - t[:, 1]) if dj == 0 else t[:, 1]
            for dk in (0, 1):
                wz = (1 - t[:, 2]) if dk == 0 else t[:, 2]
                c = c + wx * wy * wz * at(di, dj, dk)
    return np.asarray(c)


def density_rect(dmap: DensityMap, atom_posits: np.ndarray,
                 margin: float = 2.0) -> DensityMap:
    """Crop the smallest brick covering all atoms + margin
    (reference DensityRect::new, reflection.rs:142)."""
    pts = np.asarray(atom_posits, float)
    lo = pts.min(axis=0) - margin
    hi = pts.max(axis=0) + margin
    step = dmap.step
    i_lo = np.floor((lo - dmap.origin) / step).astype(int)
    i_hi = np.ceil((hi - dmap.origin) / step).astype(int) + 1
    dims = np.asarray(dmap.dims)
    idx = [np.arange(i_lo[d], i_hi[d]) % dims[d] for d in range(3)]
    sub = dmap.data[np.ix_(idx[0], idx[1], idx[2])]
    return DensityMap(
        data=sub,
        cell=tuple((i_hi - i_lo) * step),
        origin=dmap.origin + i_lo * step)


def density_from_atoms(positions: np.ndarray, numbers: Sequence[float],
                       cell, grid: Tuple[int, int, int],
                       b_factor: float = 15.0) -> DensityMap:
    """Gaussian-atom model density on a periodic grid (used for synthetic
    maps, map cross-correlation, and the surface mesher)."""
    import jax
    import jax.numpy as jnp

    nx, ny, nz = grid
    cell = np.asarray(cell, float)

    @jax.jit
    def build(pos, z):
        gx = (jnp.arange(nx) + 0.5) * cell[0] / nx
        gy = (jnp.arange(ny) + 0.5) * cell[1] / ny
        gz = (jnp.arange(nz) + 0.5) * cell[2] / nz
        sig2 = b_factor / (8.0 * jnp.pi ** 2)

        def one_atom(carry, ai):
            p, zz = ai
            dx = gx - p[0]
            dx -= cell[0] * jnp.round(dx / cell[0])
            dy = gy - p[1]
            dy -= cell[1] * jnp.round(dy / cell[1])
            dz = gz - p[2]
            dz -= cell[2] * jnp.round(dz / cell[2])
            g = (jnp.exp(-0.5 * dx * dx / sig2)[:, None, None]
                 * jnp.exp(-0.5 * dy * dy / sig2)[None, :, None]
                 * jnp.exp(-0.5 * dz * dz / sig2)[None, None, :])
            return carry + zz * g, None

        out, _ = jax.lax.scan(one_atom, jnp.zeros(grid),
                              (pos, jnp.asarray(z, jnp.float32)))
        return out / (2 * jnp.pi * sig2) ** 1.5

    rho = build(jnp.asarray(positions, jnp.float32),
                np.asarray(numbers, np.float32))
    return DensityMap(data=np.asarray(rho), cell=tuple(cell))
