"""Flagship-scale (25k-site) sharded-colpair force parity -> artifact.

Runs the production direct-space kernel block-sharded over the virtual
8-device CPU mesh (parallel/spatial_colpair.py: ppermute halos + halo
force reduce) against the single-device kernel on the SAME sorted state,
and records the result in docs/SPATIAL25K.json (VERDICT r4 ask #8: the
spatial proof at the flagship system; the runnable version is
tests/test_spatial_colpair.py::test_sharded_colpair_matches_single_device_25k,
marked slow — interpret-mode pallas at this size is minutes of CPU).

Run: python scripts/spatial25k_parity.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))


def main():
    from test_spatial_colpair import _build_sorted
    from molchanica_tpu.ops.pallas.colpair import make_colpair_direct_fn
    from molchanica_tpu.parallel.spatial_colpair import (
        halo_depth_for, make_sharded_colpair_direct)
    from molchanica_tpu.systems.bench_systems import build_solvated_protein

    t00 = time.perf_counter()
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("sp",))
    asys = build_solvated_protein(n_residues=250, target_sites=25000, seed=3)
    top = asys.topology
    n = top.n_atoms
    box = np.asarray(asys.box_extent, np.float64)
    x0 = np.asarray(asys.positions, np.float64)
    fixture = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "molchanica_tpu", "systems", "data",
        "eq25k.npz")
    if os.path.exists(fixture):
        d = np.load(fixture)
        if d["x"].shape[0] == n:
            x0 = np.asarray(d["x"], np.float64)
    q = np.asarray(top.charges) * np.asarray(top.atom_mask)
    sig = np.asarray(top.lj_sigma)
    eps = np.asarray(top.lj_eps)
    plan, rows, wl, nw, boxj = _build_sorted(x0, q, sig, eps, box, 9.0,
                                             n_dev)
    halo = halo_depth_for(plan, n_dev, wl, nw)
    couple = jnp.asarray(1.0, jnp.float32)
    t0 = time.perf_counter()
    one = jax.jit(make_colpair_direct_fn(
        plan, has_alch=False, want_energy=True, interpret=True,
        triangular=True))
    f_ref, elj_ref, ec_ref = one(rows, rows.T, wl, nw, boxj, couple)
    f_ref = np.asarray(f_ref)
    single_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sharded = make_sharded_colpair_direct(
        mesh, "sp", plan, halo, has_alch=False, want_energy=True,
        interpret=True)
    with mesh:
        f_sh, elj_sh, ec_sh = jax.jit(sharded)(rows, wl, nw, boxj, couple)
    f_sh = np.asarray(f_sh)
    sharded_s = time.perf_counter() - t0
    scale = float(np.abs(f_ref).max())
    rel_f = float(np.abs(f_sh - f_ref).max() / scale)
    rel_ec = abs(float(ec_sh) - float(ec_ref)) / abs(float(ec_ref))
    rel_lj = abs(float(elj_sh) - float(elj_ref)) / max(
        abs(float(elj_ref)), 1.0)
    out = {
        "n_sites": int(n),
        "n_devices": n_dev,
        "halo_depth": int(halo),
        "rc": 9.0,
        "force_rel_maxabs": rel_f,
        "e_coulomb_rel": rel_ec,
        "e_lj_rel": rel_lj,
        "ok": bool(rel_f < 1e-4 and rel_ec < 1e-5 and rel_lj < 1e-5),
        "single_device_s": round(single_s, 1),
        "sharded_s": round(sharded_s, 1),
        "total_s": round(time.perf_counter() - t00, 1),
        "note": ("production colpair kernel block-sharded over the virtual "
                 "8-device CPU mesh (interpret-mode pallas), ppermute halo "
                 "exchange + halo force reduce, vs the single-device kernel "
                 "on the same sorted 25k state"),
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SPATIAL25K.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
