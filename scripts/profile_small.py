"""In-scan phase profile of the vacuum-ligand step (bench_all config 1).

Configs 1-2 run at ~140-200 us/step on a TPU — pure op-count overhead at 33
atoms. This isolates force vs integrator vs H-constraints inside one scan
dispatch so the cuts target the right ops. Run on the chip.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_chip_cache")

import jax
import jax.numpy as jnp

from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.engine import MdSim
from molchanica_tpu.molecules.smiles import from_smiles
from molchanica_tpu.molecules.spec import assemble_system

N = 400


def scan_time(fn_body, init, n=N, reps=3):
    def prog(init):
        def body(c, _):
            return fn_body(c), None
        out, _ = jax.lax.scan(body, init, None, length=n)
        return out
    j = jax.jit(prog)
    r = j(init)
    jax.block_until_ready(r)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        r = j(init)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e6          # us/iter


def build(hc):
    mol = from_smiles("CC(C)Cc1ccc(cc1)C(C)C(=O)O")
    spec = mol.to_spec(strict=False)
    asys = assemble_system([spec])
    cfg = MdConfig(integrator=Integrator.verlet_velocity(thermostat=None),
                   temp_target=300.0, dtype="float32",
                   hydrogen_constraint=hc,
                   max_init_relaxation_iters=50, steps_per_chunk=500, seed=1)
    return MdSim(asys.topology, cfg, asys.positions)


def main():
    res = {}
    sim = build(HydrogenConstraint.shake())
    st = sim.state

    def dep(x, f):
        return x + 0.0 * jax.lax.stop_gradient(f[:1])

    def force_body(x):
        f, _ = sim.force_fn(x, st.box, st.couple)
        return dep(x, f)
    res["force_only"] = scan_time(force_body, st.positions)

    one = sim._make_one_step(0.001, sim.force_fn)
    f0, _ = sim.force_fn(st.positions, st.box, st.couple)

    def step_body(c):
        x, v, f, k = c
        x, v, f, e, terms, k = one(x, v, f, st.box, st.couple, k)
        return (x, v, f, k)
    res["full_step_shake"] = scan_time(
        step_body, (st.positions, st.velocities, f0, st.rng_key))

    if sim._cp is not None:
        def cp_body(x):
            return sim._cp(x + 0.0001, x)
        res["constrain_pos"] = scan_time(cp_body, st.positions)

        def cv_body(v):
            return sim._cv(v, st.positions)
        res["constrain_vel"] = scan_time(cv_body, st.velocities)

    simf = build(HydrogenConstraint.flexible())
    onef = simf._make_one_step(0.001, simf.force_fn)
    stf = simf.state
    ff0, _ = simf.force_fn(stf.positions, stf.box, stf.couple)

    def stepf_body(c):
        x, v, f, k = c
        x, v, f, e, terms, k = onef(x, v, f, stf.box, stf.couple, k)
        return (x, v, f, k)
    res["full_step_flexible"] = scan_time(
        stepf_body, (stf.positions, stf.velocities, ff0, stf.rng_key))

    for k, v in res.items():
        print(f"{k:22s} {v:9.1f} us")


if __name__ == "__main__":
    main()
