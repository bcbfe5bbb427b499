"""Probe: does the axon relay's Mosaic toolchain support the block-pair
pattern the round-5 kernel needs?

Pattern under test (the TPU-idiomatic sparse pairlist):
  grid = (NC, W); scalar-prefetched slice list `sl [NC, W]` drives the
  j-input BlockSpec index_map; per-cluster output block revisited across
  the W axis (accumulate in place, init at w == 0); plus a whole-array
  [8, S] VMEM accumulator RMW'd at dynamic offsets (the reaction-force
  pattern the production colpair kernel already uses).

Run:  python scripts/probe_prefetch.py          (chip)
      MOLCHANICA_INTERPRET=1 python scripts/probe_prefetch.py   (CPU sim)
"""
import os
import sys
import time

import numpy as np

if os.environ.get("MOLCHANICA_INTERPRET") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ICL = 64
LAN = 128


def kernel(nw_ref, sl_ref, rows_ref, pT_ref, o_ref, o2_ref):
    ci = pl.program_id(0)
    w = pl.program_id(1)
    W = pl.num_programs(1)

    @pl.when(jnp.logical_and(ci == 0, w == 0))
    def _init2():
        o2_ref[...] = jnp.zeros_like(o2_ref)

    @pl.when(w == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(w < nw_ref[ci])
    def _body():
        xi = rows_ref[:, 0:1]                    # [ICL, 1]
        jx = pT_ref[0:1, :]                      # [1, LAN]
        d = xi - jx
        contrib = d * d
        o_ref[:, 0:1] = o_ref[:, 0:1] + jnp.sum(
            contrib, axis=1, keepdims=True)
        # reaction into the whole-array accumulator at the slice offset
        start = sl_ref[ci, w] * LAN
        o2_ref[0:1, pl.ds(start, LAN)] = (
            o2_ref[0:1, pl.ds(start, LAN)]
            + jnp.sum(contrib, axis=0, keepdims=True))


def main():
    interpret = os.environ.get("MOLCHANICA_INTERPRET") == "1"
    NC, W = 16, 8
    S = NC * ICL                                  # 1024 slots, 8 slices
    NS = S // LAN
    rng = np.random.default_rng(0)
    rows = rng.normal(size=(S, 8)).astype(np.float32)
    pT = np.ascontiguousarray(rows.T)
    nw = rng.integers(1, W + 1, size=(NC,)).astype(np.int32)
    sl = rng.integers(0, NS, size=(NC, W)).astype(np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NC, W),
        in_specs=[
            pl.BlockSpec((ICL, 8), lambda ci, w, nw_r, sl_r: (ci, 0)),
            pl.BlockSpec((8, LAN),
                         lambda ci, w, nw_r, sl_r: (0, sl_r[ci, w])),
        ],
        out_specs=[
            pl.BlockSpec((ICL, 8), lambda ci, w, nw_r, sl_r: (ci, 0)),
            pl.BlockSpec(
                (8, S), lambda ci, w, nw_r, sl_r: (0, 0)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((S, 8), jnp.float32),
                   jax.ShapeDtypeStruct((8, S), jnp.float32)],
        interpret=interpret,
    )
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    o, o2 = jfn(jnp.asarray(nw), jnp.asarray(sl),
                jnp.asarray(rows), jnp.asarray(pT))
    o, o2 = np.asarray(o), np.asarray(o2)
    dt = time.perf_counter() - t0

    # reference
    o_ref = np.zeros((S, 8), np.float32)
    o2_ref = np.zeros((8, S), np.float32)
    for ci in range(NC):
        xi = rows[ci * ICL:(ci + 1) * ICL, 0:1]
        for w in range(int(nw[ci])):
            s = int(sl[ci, w])
            jx = pT[0:1, s * LAN:(s + 1) * LAN]
            c = (xi - jx) ** 2
            o_ref[ci * ICL:(ci + 1) * ICL, 0] += c.sum(1)
            o2_ref[0, s * LAN:(s + 1) * LAN] += c.sum(0)
    e1 = np.abs(o - o_ref).max() / max(np.abs(o_ref).max(), 1e-9)
    e2 = np.abs(o2 - o2_ref).max() / max(np.abs(o2_ref).max(), 1e-9)
    print(f"compile+run {dt:.1f}s  rel_err o={e1:.2e} o2={e2:.2e}")
    ok = e1 < 1e-6 and e2 < 1e-6
    print("PROBE", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
