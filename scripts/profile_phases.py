"""Floor-free per-phase profile at 25k sites: every phase is timed at TWO
scan lengths (N1, N2) in single dispatches; the per-iteration cost is the
SLOPE (t2-t1)/(N2-N1), which cancels the ~28 ms relay dispatch floor AND
any fixed per-dispatch transfer cost. Also times the production chunk at
periods=1 and periods=10 the same way is impossible (one dispatch each),
so those are reported floor-corrected (minus 28.3/steps)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.fast_engine import FastSim
from molchanica_tpu.systems.bench_systems import build_solvated_protein

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "molchanica_tpu", "systems", "data", "eq25k.npz")
N1, N2 = 30, 120


def best_of(fn, n=5):
    fn()
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_scan):
    """make_scan(length) -> zero-arg jitted callable; returns ms/iter."""
    f1, f2 = make_scan(N1), make_scan(N2)
    t1 = best_of(f1)
    t2 = best_of(f2)
    return (t2 - t1) / (N2 - N1) * 1e3


def main():
    asys = build_solvated_protein(n_residues=250, target_sites=25000,
                                  seed=3)
    cfg = MdConfig(
        integrator=Integrator.langevin_middle(gamma=1.0, cadence="light"),
        temp_target=310.0, lj_cutoff=9.0, coulomb_cutoff=9.0,
        hydrogen_constraint=HydrogenConstraint.shake(),
        dtype="float32", max_init_relaxation_iters=None,
        neighbor_rebuild_every=20, seed=7)
    d = np.load(FIXTURE)
    sim = FastSim(asys.topology, cfg, d["x"], box_extent=asys.box_extent,
                  velocities=d["v"])
    print(f"[prof] init done T0={sim.temperature():.1f}", file=sys.stderr,
          flush=True)
    st = sim.state
    cp, cv = sim._make_cp_cv()
    f_only = sim._make_force_fn(None, want_energy=False)
    f_full = sim._make_force_fn(None, want_energy=True)
    recip_w = sim._make_force_fn(None, want_energy=False, recip_weight=0.0)

    def scan_of(body):
        def make(length):
            @jax.jit
            def run(x0):
                def b(c, _):
                    return body(c), None
                y, _ = jax.lax.scan(b, x0, None, length=length)
                return y
            x0 = st.x
            return lambda: jax.block_until_ready(run(x0))
        return make

    jitter = lambda x: x * 0.999999 + 1e-6

    rows = []
    rows.append(("cp (SETTLE+MSHAKE pos)", slope(scan_of(
        lambda x: cp(jitter(x), st.x, st)))))
    rows.append(("cv (RATTLE vel)", slope(scan_of(
        lambda x: cv(jitter(x), st.x, st)))))
    rows.append(("force full (colpair+PME+rest)", slope(scan_of(
        lambda x: jitter(x) + f_only(x, st)[0]))))
    rows.append(("force direct-only (recip_w=0)", slope(scan_of(
        lambda x: jitter(x) + recip_w(x, st)[0]))))
    rows.append(("force full w/ energies", slope(scan_of(
        lambda x: jitter(x) + f_full(x, st)[0]))))

    # noise draw per step
    def make_noise(length):
        @jax.jit
        def run(key):
            def b(k, _):
                k, sub = jax.random.split(k)
                n = jax.random.normal(sub, st.v.shape, jnp.float32)
                return jax.random.fold_in(k, jnp.int32(n[0, 0])), None
            y, _ = jax.lax.scan(b, key, None, length=length)
            return y
        k0 = st.rng_key
        return lambda: jax.block_until_ready(run(k0))
    rows.append(("rng per-step draw", slope(make_noise)))

    for name, ms in rows:
        print(f"{name:34s} {ms:7.3f} ms/iter", flush=True)

    # production chunk, floor-corrected
    for periods in (1, 10):
        k = cfg.neighbor_rebuild_every
        fn = sim._get_chunk_fn(0.002, k, False, None, periods=periods)
        t = best_of(lambda: jax.block_until_ready(fn(st)[0].x), n=4)
        steps = k * periods
        print(f"chunk periods={periods:2d}: raw {t/steps*1e3:6.3f} "
              f"floor-corr {(t-0.0283)/steps*1e3:6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
