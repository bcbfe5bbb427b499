"""Spatial domain decomposition: one simulation sharded over a device mesh.

The TPU-native analog of the reference's cell-list spatial structure taken
across chips (SURVEY §2.4 / §7 stage 10): the box is split into slabs
along x, each device owns the atoms in its slab, and short-range forces
need only the neighboring slabs' atoms — exchanged with `jax.lax.ppermute`
over the ICI ring inside a `shard_map`. Long-range (PME reciprocal) energy
is a global quantity; the prototype evaluates it from the all-gathered
positions (the grid is tiny — a 64³ mesh fits trivially on every chip; a
distributed FFT is only worth it far beyond this system scale).

This module is the communication/correctness prototype: direct-space
forces use a masked dense local×(local+halo) pair sum rather than the
colpair kernel (per-shard colpair plans drop in later — the halo contract
is identical). Validated on the virtual 8-device CPU mesh in
tests/test_spatial.py: forces match a single-device reference to f32
tolerance. `__graft_entry__.dryrun_multichip` runs both this spatial mode
and the replica farm.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:                                     # jax >= 0.6 top-level export
    from jax import shard_map
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def partition_slabs(x, box, n_dev: int, cap: int = None):
    """Host-side: bin atoms into x-slabs -> (x_sh [n_dev, cap, 3],
    mask [n_dev, cap], owner [n_dev, cap] original indices; -1 pad).

    cap defaults to a padded max slab count (power-of-2-ish headroom for
    density fluctuation)."""
    x = np.asarray(x)
    n = x.shape[0]
    lx = float(box[0])
    w = lx / n_dev
    xw = x - np.floor(x / np.asarray(box)) * np.asarray(box)
    slab = np.minimum((xw[:, 0] / w).astype(int), n_dev - 1)
    counts = np.bincount(slab, minlength=n_dev)
    if cap is None:
        cap = int(-(-int(counts.max() * 1.25 + 8) // 8) * 8)
    assert counts.max() <= cap, f"slab overflow: {counts.max()} > {cap}"
    xs = np.zeros((n_dev, cap, 3), np.float32)
    mask = np.zeros((n_dev, cap), np.float32)
    owner = np.full((n_dev, cap), -1, np.int64)
    for dev in range(n_dev):
        ids = np.where(slab == dev)[0]
        xs[dev, :len(ids)] = xw[ids]
        mask[dev, :len(ids)] = 1.0
        owner[dev, :len(ids)] = ids
    return xs, mask, owner


def _pair_energy_force(xi, mi, xj, mj, qi, qj, si, sj, ei, ej, box, rc):
    """Masked dense LJ + real-space-Ewald-free Coulomb between an i block
    [ci,3] and a j block [cj,3]; returns (E_half_counted, F_i [ci,3]).

    Plain cutoff Coulomb here: the prototype validates the DECOMPOSITION
    (ownership + halo + collectives); the production force path swaps in
    the colpair kernel + PME per shard."""
    d = xi[:, None, :] - xj[None, :, :]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1)
    ok = (r2 < rc * rc) & (r2 > 1e-9) & (mi[:, None] > 0) & (mj[None, :] > 0)
    r2s = jnp.maximum(r2, 0.25)
    inv_r = jax.lax.rsqrt(r2s)
    inv_r2 = inv_r * inv_r
    sig = si[:, None] + sj[None, :]
    eps4 = ei[:, None] * ej[None, :]
    s2 = jnp.minimum(sig * sig * inv_r2, 6.25)
    s6 = s2 * s2 * s2
    e_lj = eps4 * (s6 * s6 - s6)
    kqq = qi[:, None] * qj[None, :]
    e_c = kqq * inv_r
    de = eps4 * (3.0 * s6 - 6.0 * s6 * s6) * inv_r2 - 0.5 * kqq * inv_r2 * inv_r
    coeff = jnp.where(ok, de, 0.0)
    f_i = -jnp.sum((2.0 * coeff)[:, :, None] * d, axis=1)
    e = 0.5 * jnp.sum(jnp.where(ok, e_lj + e_c, 0.0))
    return e, f_i


def make_spatial_force_fn(mesh: Mesh, axis: str, box, rc: float,
                          halo_depth: int = 1):
    """Build force(x_sh, mask, q_sh, sig_sh, eps_sh) -> (E_total, F_sh)
    sharded over `axis`: each device computes forces on ITS atoms from its
    own slab plus ppermute-exchanged neighbor slabs (halo_depth slabs per
    side; slab width must be >= rc / halo_depth)."""
    n_dev = mesh.shape[axis]
    boxj = jnp.asarray(box, jnp.float32)

    def local(x, m, q, s, e):
        # x: [1, cap, 3] block of this device
        x = x[0]
        m = m[0]
        q = q[0]
        s = s[0]
        e = e[0]
        etot, f = _pair_energy_force(x, m, x, m, q, q, s, s, e, e,
                                     boxj, rc)
        for side in (+1, -1):
            xn, mn, qn, sn, en = x, m, q, s, e
            for _ in range(halo_depth):
                perm = [(i, (i + side) % n_dev) for i in range(n_dev)]
                xn = jax.lax.ppermute(xn, axis, perm)
                mn = jax.lax.ppermute(mn, axis, perm)
                qn = jax.lax.ppermute(qn, axis, perm)
                sn = jax.lax.ppermute(sn, axis, perm)
                en = jax.lax.ppermute(en, axis, perm)
                eh, fh = _pair_energy_force(x, m, xn, mn, q, qn, s, sn,
                                            e, en, boxj, rc)
                # each cross-slab pair is seen by BOTH owners, each
                # half-counted -> summing over shards counts it once
                etot = etot + eh
                f = f + fh
        etot = jax.lax.psum(etot, axis)
        return etot[None], f[None]

    # returns (E [n_dev] — every shard carries the same psum'd total —
    # and F [n_dev, cap, 3] sharded like the input)
    return shard_map(local, mesh=mesh,
                     in_specs=(P(axis), P(axis), P(axis), P(axis),
                               P(axis)),
                     out_specs=(P(axis), P(axis)))


def spatial_reference_force(x, mask, q, sig, eps, box, rc):
    """Single-device dense reference with the same pair math."""
    boxj = jnp.asarray(box, jnp.float32)
    e, f = _pair_energy_force(x, mask, x, mask, q, q, sig, sig, eps, eps,
                              boxj, rc)
    return e, f
