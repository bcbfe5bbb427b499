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


def _pair_energy_force(xi, mi, xj, mj, qi, qj, si, sj, ei, ej, box, rc,
                       beta=None):
    """Masked dense LJ + Coulomb between an i block [ci,3] and a j block
    [cj,3]; returns (E_half_counted, F_i [ci,3]).

    beta=None: plain cutoff Coulomb (decomposition prototype).
    beta=float: erfc(beta r)/r direct-space Ewald — pairs with the
    replicated-grid PME reciprocal in make_spatial_force_fn."""
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
    if beta is None:
        e_c = kqq * inv_r
        dc = -0.5 * kqq * inv_r2 * inv_r
    else:
        r = r2s * inv_r
        erfc_v = jax.scipy.special.erfc(beta * r)
        e_c = kqq * erfc_v * inv_r
        dc = -kqq * inv_r2 * (0.5 * erfc_v * inv_r
                              + beta / jnp.sqrt(jnp.pi)
                              * jnp.exp(-(beta * r) ** 2))
    de = eps4 * (3.0 * s6 - 6.0 * s6 * s6) * inv_r2 + dc
    coeff = jnp.where(ok, de, 0.0)
    f_i = -jnp.sum((2.0 * coeff)[:, :, None] * d, axis=1)
    e = 0.5 * jnp.sum(jnp.where(ok, e_lj + e_c, 0.0))
    return e, f_i


def make_spatial_force_fn(mesh: Mesh, axis: str, box, rc: float,
                          halo_depth: int = 1, beta=None, pme_grid=None):
    """Build force(x_sh, mask, q_sh, sig_sh, eps_sh) -> (E_total, F_sh)
    sharded over `axis`: each device computes forces on ITS atoms from its
    own slab plus ppermute-exchanged neighbor slabs (halo_depth slabs per
    side; slab width must be >= rc / halo_depth).

    With beta + pme_grid set, electrostatics are FULL smooth-PME Ewald:
    erfc(beta r) direct within the halo reach, plus the reciprocal sum on
    a replicated grid — every device all_gathers positions/charges (tiny:
    a 64^3 mesh + 25k atoms fit trivially per chip; SURVEY §5 long-axis
    note) and evaluates the identical recip energy; recip forces on the
    LOCAL atoms come from autodiff through the all_gather (its transpose
    is a psum_scatter, so the backward pass stays sharded). q is then in
    plain electron units and the Ewald self-energy is included. No
    intramolecular exclusions yet: atomic fluids (argon/ionic gas)."""
    n_dev = mesh.shape[axis]
    boxj = jnp.asarray(box, jnp.float32)
    if pme_grid is not None:
        assert beta is not None, "pme_grid requires beta"
        from ..constants import COULOMB_CONST
        from ..ops.pme2 import make_pme2_recip_fn
        recip_fn = make_pme2_recip_fn(tuple(pme_grid), float(beta))
        sqrt_kc = float(np.sqrt(COULOMB_CONST))
        self_c = float(beta / np.sqrt(np.pi) * COULOMB_CONST)

    def local(x, m, q, s, e):
        # x: [1, cap, 3] block of this device
        x = x[0]
        m = m[0]
        q = q[0]
        s = s[0]
        e = e[0]
        qd = q * sqrt_kc if pme_grid is not None else q
        etot, f = _pair_energy_force(x, m, x, m, qd, qd, s, s, e, e,
                                     boxj, rc, beta=beta)
        for side in (+1, -1):
            xn, mn, qn, sn, en = x, m, qd, s, e
            for _ in range(halo_depth):
                perm = [(i, (i + side) % n_dev) for i in range(n_dev)]
                xn = jax.lax.ppermute(xn, axis, perm)
                mn = jax.lax.ppermute(mn, axis, perm)
                qn = jax.lax.ppermute(qn, axis, perm)
                sn = jax.lax.ppermute(sn, axis, perm)
                en = jax.lax.ppermute(en, axis, perm)
                eh, fh = _pair_energy_force(x, m, xn, mn, qd, qn, s, sn,
                                            e, en, boxj, rc, beta=beta)
                # each cross-slab pair is seen by BOTH owners, each
                # half-counted -> summing over shards counts it once
                etot = etot + eh
                f = f + fh
        etot = jax.lax.psum(etot, axis)
        if pme_grid is not None:
            q_real = q * (m > 0)

            def e_rec(xl):
                xa = jax.lax.all_gather(xl, axis).reshape(-1, 3)
                qa = jax.lax.all_gather(q_real, axis).reshape(-1)
                return recip_fn(xa, qa, boxj)

            er, fr_neg = jax.value_and_grad(e_rec)(x)
            e_self = jax.lax.psum(-self_c * jnp.sum(q_real * q_real),
                                  axis)
            etot = etot + er + e_self      # er is replicated, psum'd once
            # all_gather's transpose is a psum_scatter: every device holds
            # the identical replicated e_rec, so the pulled-back cotangent
            # arrives n_dev times — normalize to the true dE/dx_local
            f = f - fr_neg / n_dev
        return etot[None], f[None]

    # returns (E [n_dev] — every shard carries the same psum'd total —
    # and F [n_dev, cap, 3] sharded like the input)
    # check_vma=False: the replicated-grid recip accumulates a scan carry
    # whose varying-manual-axes typing the checker can't unify with the
    # invariant zero init (the math is correct: every shard computes the
    # identical replicated recip energy).
    return shard_map(local, mesh=mesh,
                     in_specs=(P(axis), P(axis), P(axis), P(axis),
                               P(axis)),
                     out_specs=(P(axis), P(axis)), check_vma=False)


def spatial_reference_force(x, mask, q, sig, eps, box, rc):
    """Single-device dense reference with the same pair math."""
    boxj = jnp.asarray(box, jnp.float32)
    e, f = _pair_energy_force(x, mask, x, mask, q, q, sig, sig, eps, eps,
                              boxj, rc)
    return e, f


def make_spatial_step_fn(mesh: Mesh, axis: str, box, rc: float,
                         dt: float, gamma: float, temp_target: float,
                         beta=None, pme_grid=None):
    """Sharded Langevin-middle MD chunk: k steps of ONE simulation
    decomposed over the mesh, halo forces exchanged via ppermute every
    step. Returns chunk(x_sh, v_sh, m_sh, q, s, e, mass, key, k) ->
    (x_sh, v_sh, ke_total).

    beta + pme_grid enable full smooth-PME electrostatics per step (see
    make_spatial_force_fn): q is then in plain electron units.

    Per-device RNG: the caller's key is folded with the shard index, so
    the noise stream is independent per slab and reproducible."""
    from ..constants import ACCEL_FACTOR, KB

    n_dev = mesh.shape[axis]
    boxj = jnp.asarray(box, jnp.float32)
    c1 = jnp.exp(-gamma * dt)
    if pme_grid is not None:
        assert beta is not None, "pme_grid requires beta"
        from ..constants import COULOMB_CONST
        from ..ops.pme2 import make_pme2_recip_fn
        recip_fn = make_pme2_recip_fn(tuple(pme_grid), float(beta))
        sqrt_kc = float(np.sqrt(COULOMB_CONST))

    def slab_force(x, m, q, s, e):
        qd = q * sqrt_kc if pme_grid is not None else q
        etot, f = _pair_energy_force(x, m, x, m, qd, qd, s, s, e, e,
                                     boxj, rc, beta=beta)
        for side in (+1, -1):
            xn, mn, qn, sn, en = x, m, qd, s, e
            perm = [(i, (i + side) % n_dev) for i in range(n_dev)]
            xn = jax.lax.ppermute(xn, axis, perm)
            mn = jax.lax.ppermute(mn, axis, perm)
            qn = jax.lax.ppermute(qn, axis, perm)
            sn = jax.lax.ppermute(sn, axis, perm)
            en = jax.lax.ppermute(en, axis, perm)
            eh, fh = _pair_energy_force(x, m, xn, mn, qd, qn, s, sn,
                                        e, en, boxj, rc, beta=beta)
            etot = etot + eh
            f = f + fh
        if pme_grid is not None:
            q_real = q * (m > 0)

            def e_rec(xl):
                xa = jax.lax.all_gather(xl, axis).reshape(-1, 3)
                qa = jax.lax.all_gather(q_real, axis).reshape(-1)
                return recip_fn(xa, qa, boxj)

            er, fr_neg = jax.value_and_grad(e_rec)(x)
            etot = etot + er
            f = f - fr_neg / n_dev   # see make_spatial_force_fn note
        return etot, f

    def local(x, v, m, q, s, e, mass, key, k_steps):
        x, v, m, q, s, e, mass = (a[0] for a in (x, v, m, q, s, e, mass))
        key = jax.random.fold_in(key[0], jax.lax.axis_index(axis))
        inv_mass = jnp.where(mass > 0, 1.0 / jnp.maximum(mass, 1e-6), 0.0)
        dm = (m > 0).astype(jnp.float32)[:, None]
        sigma = jnp.sqrt(KB * temp_target * ACCEL_FACTOR
                         * inv_mass * (1.0 - c1 * c1))[:, None]

        def body(carry, _):
            x, v, f, key = carry
            a = f * (ACCEL_FACTOR * inv_mass)[:, None] * dm
            v1 = v + dt * a                                  # B
            x1 = x + 0.5 * dt * v1 * dm                      # A
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, v.shape, v.dtype) * sigma
            v2 = (c1 * v1 + noise) * dm                      # O
            x2 = x1 + 0.5 * dt * v2 * dm                     # A
            _e, f2 = slab_force(x2, m, q, s, e)
            return (x2, v2, f2, key), None

        _e0, f0 = slab_force(x, m, q, s, e)
        (x, v, f, key), _ = jax.lax.scan(
            body, (x, v, f0, key), None, length=k_steps)
        ke = 0.5 * jnp.sum(mass * dm[:, 0]
                           * jnp.sum(v * v, axis=-1)) / ACCEL_FACTOR
        ke = jax.lax.psum(ke, axis)
        return x[None], v[None], ke[None]

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), None),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False)


def spatial_md_run(x, v, masses, q, sig, eps, box, mesh: Mesh, axis: str,
                   rc: float, dt: float, n_steps: int,
                   rebuild_every: int = 10, gamma: float = 2.0,
                   temp_target: float = 300.0, seed: int = 0,
                   beta=None, pme_grid=None):
    """Run ONE simulation spatially decomposed over the mesh.

    Host re-partitions atoms into x-slabs every `rebuild_every` steps
    (the FastSim rebuild-cadence analog: atoms may drift between slabs
    only within the skin the slab width affords — slab width must exceed
    rc by the expected drift). Returns (x, v, ke_history) in the original
    atom order."""
    n_dev = mesh.shape[axis]
    x = np.asarray(x, np.float32)
    v = np.asarray(v, np.float32)
    step_fn = jax.jit(make_spatial_step_fn(mesh, axis, box, rc, dt,
                                           gamma, temp_target,
                                           beta=beta, pme_grid=pme_grid),
                      static_argnums=(8,))
    key = jax.random.PRNGKey(seed)
    kes = []
    done = 0
    while done < n_steps:
        k = min(rebuild_every, n_steps - done)
        xs, m_sh, owner = partition_slabs(x, box, n_dev)
        cap = xs.shape[1]

        def grp(a, width=None):
            shape = (n_dev, cap) if width is None else (n_dev, cap, width)
            out = np.zeros(shape, np.float32)
            for dd in range(n_dev):
                ids = owner[dd][owner[dd] >= 0]
                out[dd, :len(ids)] = a[ids]
            return jnp.asarray(out)

        key, sub = jax.random.split(key)
        keys = jnp.tile(sub[None], (n_dev, 1))
        with mesh:
            xs2, vs2, ke = step_fn(
                grp(x, 3), grp(v, 3), jnp.asarray(m_sh), grp(q),
                grp(sig), grp(eps), grp(masses), keys, k)
        xs2 = np.asarray(xs2)
        vs2 = np.asarray(vs2)
        for dd in range(n_dev):
            ids = owner[dd][owner[dd] >= 0]
            x[ids] = xs2[dd, :len(ids)]
            v[ids] = vs2[dd, :len(ids)]
        kes.append(float(np.asarray(ke)[0]))
        done += k
    return x, v, np.asarray(kes)
