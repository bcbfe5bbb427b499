"""On-chip sweep of PME reciprocal variants at the 25k bench geometry.

Times value_and_grad (what the step pays) in-scan, and reports accuracy of
each variant against the f32 pme3 baseline (energy rel err + max force diff).
Run: python scripts/sweep_pme.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from molchanica_tpu.ops.pme import default_grid, ewald_beta_for
from molchanica_tpu.ops.pme2 import make_pme2_recip_fn
from molchanica_tpu.ops.pme3 import default_grid6, make_pme3_recip_fn

N_ITER = 30


def scan_time(fn, x, q, box, n=N_ITER, reps=3):
    def prog(x):
        def body(c, _):
            e, g = jax.value_and_grad(lambda xx: fn(xx, q, box))(c)
            return c + 1e-12 * g, None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    j = jax.jit(prog)
    r = j(x)
    jax.block_until_ready(r)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        r = j(x)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def main():
    rng = np.random.default_rng(0)
    box = np.array([63.0, 63.0, 63.0])
    n = 24940
    x = jnp.asarray(rng.uniform(0, 63.0, (n, 3)).astype(np.float32))
    q = rng.uniform(-0.8, 0.8, n).astype(np.float32)
    q -= q.mean()
    q = jnp.asarray(q)
    boxj = jnp.asarray(box, jnp.float32)
    beta = float(ewald_beta_for(9.0, 1e-5))
    print(f"beta={beta:.4f}")

    g6 = default_grid6(box, beta)
    g4 = default_grid(box)
    print(f"grid6={g6} grid4={g4}")

    which = sys.argv[1:] or ["f32_c1024", "bf16_c1024", "bf16_c4096"]
    builders = {
        "f32_c1024": lambda: make_pme3_recip_fn(g6, beta, order=6),
        "f32_c4096": lambda: make_pme3_recip_fn(g6, beta, order=6,
                                                chunk=4096),
        "bf16_c1024": lambda: make_pme3_recip_fn(
            g6, beta, order=6, panel_dtype=jnp.bfloat16),
        "bf16_c2048": lambda: make_pme3_recip_fn(
            g6, beta, order=6, chunk=2048, panel_dtype=jnp.bfloat16),
        "bf16_c4096": lambda: make_pme3_recip_fn(
            g6, beta, order=6, chunk=4096, panel_dtype=jnp.bfloat16),
        "pme2_64": lambda: make_pme2_recip_fn(g4, beta),
    }

    ref = make_pme3_recip_fn(g6, beta, order=6)
    e_ref, g_ref = jax.jit(jax.value_and_grad(
        lambda xx: ref(xx, q, boxj)))(x)
    e_ref = float(e_ref)
    g_ref = np.asarray(g_ref)
    gn = np.abs(g_ref).max()
    print("ref compiled", flush=True)

    for name in which:
        fn = builders[name]()
        e, g = jax.jit(jax.value_and_grad(
            lambda xx: fn(xx, q, boxj)))(x)
        de = abs(float(e) - e_ref) / abs(e_ref)
        dg = float(np.abs(np.asarray(g) - g_ref).max()) / gn
        ms = scan_time(fn, x, q, boxj)
        print(f"{name:22s} {ms:8.3f} ms   e_rel={de:.2e} fmax_rel={dg:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
