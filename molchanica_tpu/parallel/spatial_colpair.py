"""Spatial decomposition v2: the colpair Pallas kernel sharded over a mesh.

Upgrades parallel/spatial.py's masked-dense prototype to the PRODUCTION
direct-space kernel running per shard (VERDICT r3 ask #5): the sorted slot
array is split into equal contiguous blocks, one per device; each device
runs the triangular column-window kernel over its own clusters against a
local j-array assembled from its block plus `halo` neighbor blocks
exchanged with `jax.lax.ppermute` over the ICI ring; j-side reaction
forces that land in halo slots are ppermuted BACK to their owners and
summed (the classic halo force reduce). Energies are `psum`'d.

Key facts that make this exact (not an approximation):
- Slot space is ordered by (xy-column, z), so a cluster's window ranges
  are contiguous global slot intervals; in ring-of-blocks topology the
  periodic x/y wrap is the slot-space wrap, which the ppermute ring
  reproduces — device 0's "left" halo IS the top of slot space.
- The window table is the single-device table with entries converted to
  local coordinates (one subtraction mod S); the kernel runs the same
  tiles in the same order per cluster, so forces match the single-device
  kernel to f32 reassociation (validated at 25k sites in
  tests/test_spatial_colpair.py).

The rebuild (sort + window build + halo-depth check) stays replicated on
host at the FastSim rebuild cadence — the scalable story is the per-STEP
path, which is ~20x more frequent; atom migration between blocks happens
naturally at each rebuild since blocks are slot ranges of the fresh sort.

Reference framing: the reference has NO distributed runtime (SURVEY §2.4);
this is the TPU-native replacement for scaling one simulation past a chip.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas.colpair import ICL, ColPlan, make_colpair_direct_fn


def pad_plan_for_mesh(plan: ColPlan, n_dev: int) -> ColPlan:
    """Round n_sorted up so it divides into n_dev blocks of whole
    clusters (block size multiple of ICL and 128)."""
    import dataclasses
    import math
    blk = n_dev * int(np.lcm(ICL, 128))
    s2 = int(math.ceil(plan.n_sorted / blk) * blk)
    if s2 == plan.n_sorted:
        return plan
    return dataclasses.replace(plan, n_sorted=s2)


def halo_depth_for(plan: ColPlan, n_dev: int, wl, nw) -> int:
    """Smallest halo depth (blocks per side) covering every window entry
    of every cluster, measured in RING distance from the cluster's block.
    Host-side, once per rebuild (wl/nw are small)."""
    S = plan.n_sorted
    B = S // n_dev
    wl = np.asarray(wl).reshape(plan.n_clusters, -1, 3)
    nw = np.asarray(nw)
    h = 0
    for c in range(plan.n_clusters):
        own = (c * ICL) // B
        for e in range(nw[c]):
            lo, hi, _ = wl[c, e]
            if hi <= lo:
                continue
            for s in (int(lo), int(hi) - 1):
                b = s // B
                d = abs(b - own)
                h = max(h, min(d, n_dev - d))
    return h


def make_sharded_colpair_direct(mesh: Mesh, axis: str, plan: ColPlan,
                                halo: int, has_alch: bool = False,
                                want_energy: bool = True,
                                interpret: bool = False):
    """Build sharded_direct(rows_sh [S,8], wl_sh [NC,3W], nw_sh [NC],
    box, couple) -> (F [S,3] sharded, e_lj, e_c replicated).

    Inputs are GLOBAL arrays sharded over `axis` on their leading dim
    (S and NC both divide by the mesh size; use pad_plan_for_mesh).
    Window entries are global slot indices — converted per shard."""
    n_dev = mesh.shape[axis]
    S = plan.n_sorted
    NC = plan.n_clusters
    assert S % n_dev == 0 and NC % n_dev == 0, (S, NC, n_dev)
    B = S // n_dev
    NCl = NC // n_dev
    # halo may reach the ring antipode (2*halo+1 == n_dev+1 for even
    # rings): the local j-array then covers every block, possibly with one
    # duplicated block copy that the mod-S entry conversion never indexes.
    assert 2 * halo + 1 <= n_dev + 1, "halo exceeds ring"
    s_local = (2 * halo + 1) * B
    direct = make_colpair_direct_fn(
        plan, has_alch=has_alch, want_energy=want_energy,
        interpret=interpret, triangular=True,
        local_shape=(NCl, s_local, halo * B))

    def local(rows, wl, nw, box, couple):
        # shard_map local view: rows [B, 8], wl [NCl, 3W], nw [NCl]
        d = jax.lax.axis_index(axis)
        # assemble the local j-array: own block + halo blocks each side
        blocks = {0: rows}
        left = right = rows
        for k in range(1, halo + 1):
            # "left" halo = block d-k: every device RECEIVES from d-k,
            # i.e. sends to d+k
            left = jax.lax.ppermute(
                left, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)])
            right = jax.lax.ppermute(
                right, axis, [(i, (i - 1) % n_dev) for i in range(n_dev)])
            blocks[-k] = left
            blocks[k] = right
        loc = jnp.concatenate([blocks[k] for k in
                               range(-halo, halo + 1)], axis=0)
        pT = loc.T                                       # [8, s_local]
        # window entries -> local coords: local = global - (d-halo)*B,
        # wrapped into [0, S). Entries never straddle the cut (they lie
        # inside the halo window by construction/halo_depth_for).
        base = (d - halo) * B
        w3 = wl.reshape(NCl, -1, 3)
        lo = jnp.mod(w3[:, :, 0] - base, S)
        hi = lo + (w3[:, :, 1] - w3[:, :, 0])            # preserve length
        wl_loc = jnp.stack([lo, hi, w3[:, :, 2]], axis=2).reshape(
            NCl, -1).astype(jnp.int32)
        fi, fj, e_lj, e_c = direct(rows, pT, wl_loc, nw, box, couple)
        # reduce j-side reactions: center block adds locally; halo block k
        # is owned by device d+k -> ppermute it back
        f = fi + fj[halo * B:(halo + 1) * B]
        for k in range(1, halo + 1):
            back_r = jax.lax.ppermute(
                fj[(halo + k) * B:(halo + k + 1) * B], axis,
                [(i, (i + k) % n_dev) for i in range(n_dev)])
            back_l = jax.lax.ppermute(
                fj[(halo - k) * B:(halo - k + 1) * B], axis,
                [(i, (i - k) % n_dev) for i in range(n_dev)])
            f = f + back_r + back_l
        e_lj = jax.lax.psum(e_lj, axis)
        e_c = jax.lax.psum(e_c, axis)
        return f, e_lj[None], e_c[None]

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(), P()),
                   out_specs=(P(axis), P(axis), P(axis)),
                   check_vma=False)

    def sharded_direct(rows, wl, nw, box, couple):
        f, e_lj, e_c = fn(rows, wl, nw, box, couple)
        return f, e_lj[0], e_c[0]

    return sharded_direct
