"""The MD engine: builds jitted step programs and runs them in chunks.

TPU-native replacement for the reference's `MdState::new` / `step` /
`run_dynamics_blocking` surface (/root/reference/src/md/mod.rs:689,716,696).
Instead of the reference's 10-steps-per-UI-frame cooperative scheduling
(src/md/mod.rs:45), steps are dispatched in jit-compiled chunks of
`cfg.steps_per_chunk` (amortizing host->device dispatch), with snapshots
gathered on device and returned as stacked arrays per chunk.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..topology import Topology
from .config import MdConfig
from .constraints import count_constraints, make_constraint_fns
from .energy import make_dhdl_fn, make_energy_fn, make_force_fn
from .integrators import make_integrator_step
from .minimize import fire_minimize
from .state import (
    MdState,
    init_velocities,
    instantaneous_temperature,
    kinetic_energy,
    remove_com_drift,
)


def select_method(box_extent, n_atoms, cfg: MdConfig) -> str:
    if box_extent is None:
        return "allpairs"
    if n_atoms <= 2048:
        return "allpairs_cutoff"
    return "cells_pme"


class MdSim:
    """One simulation instance: static topology + config, dynamic MdState.

    Mirrors the reference `MdState` object surface where it makes sense:
    `.step(n)`, `.run(n_steps)`, `.snapshots`, `.configure_alchemical_window`,
    `.computation_time()`.
    """

    def __init__(
        self,
        top: Topology,
        cfg: MdConfig,
        x0,
        box_extent=None,
        velocities=None,
        external_forces_fn: Optional[Callable] = None,
        method: Optional[str] = None,
        relax: Optional[bool] = None,
    ):
        self.top = top
        self.cfg = cfg
        if cfg.integrator.kind not in (
                "leapfrog", "verlet_velocity", "langevin_middle"):
            raise ValueError(
                f"unknown integrator kind: {cfg.integrator.kind!r} "
                "(expected leapfrog | verlet_velocity | langevin_middle)")
        dtype = jnp.dtype(cfg.dtype)
        x0 = jnp.asarray(x0, dtype)
        n = x0.shape[0]
        assert n == top.n_atoms, (n, top.n_atoms)
        self.method = method or select_method(box_extent, n, cfg)
        box = None if box_extent is None else jnp.asarray(box_extent, dtype)

        # --- energy / force programs ---
        direct_fn = recip_fn = None
        if self.method == "cells_pme":
            from ..ops.cells import make_cell_direct_space_fn
            from ..ops.pme import make_pme_recip_fn

            direct_fn = make_cell_direct_space_fn(
                top, cfg, np.asarray(box_extent), x0=np.asarray(x0))
            recip_fn = make_pme_recip_fn(top, cfg, np.asarray(box_extent))
        self.energy_fn = make_energy_fn(
            top, cfg, self.method, pme_recip_fn=recip_fn,
            direct_space_fn=direct_fn,
        )
        self.force_fn = make_force_fn(self.energy_fn)
        self.dhdl_fn = make_dhdl_fn(self.energy_fn)

        # --- constraints ---
        cp, cv, self.n_constraints = make_constraint_fns(top, cfg, box)

        self._cp, self._cv = cp, cv
        self._external_forces_fn = external_forces_fn
        self._chunk_cache = {}

        # --- state init ---
        key = jax.random.PRNGKey(cfg.seed)
        key, vkey = jax.random.split(key)
        if velocities is None:
            velocities = init_velocities(
                vkey, top.masses, top.dof_mask, cfg.temp_target, dtype)
        else:
            velocities = jnp.asarray(velocities, dtype)
        if cp is not None:
            x0 = cp(x0, x0)

        self.state = MdState(
            positions=x0,
            velocities=velocities,
            box=box,
            step=jnp.asarray(0, jnp.int32),
            rng_key=key,
            couple=jnp.asarray(1.0, dtype),
            pe_last=jnp.asarray(0.0, dtype),
            ke_last=jnp.asarray(0.0, dtype),
            dhdl_last=jnp.asarray(0.0, dtype),
        )
        self.snapshots: list = []
        self._wall_time = 0.0

        if relax is None:
            relax = cfg.max_init_relaxation_iters is not None
        if relax and cfg.max_init_relaxation_iters:
            x_min, _ = jax.jit(
                lambda x: fire_minimize(
                    self.force_fn, x, box, self.state.couple, top.dof_mask,
                    n_steps=cfg.max_init_relaxation_iters,
                    constrain_positions=cp)
            )(self.state.positions)
            from .energy import apply_virtual_sites
            self.state = self.state.replace(
                positions=apply_virtual_sites(x_min, top))

    # ------------------------------------------------------------------
    def configure_alchemical_window(self, lam: float):
        """Reference convention: lambda 0 = fully coupled (SURVEY §2.1)."""
        self.state = self.state.replace(
            couple=jnp.asarray(1.0 - lam, self.state.positions.dtype))

    def computation_time(self) -> float:
        return self._wall_time

    @property
    def step_count(self) -> int:
        return int(self.state.step)

    # ------------------------------------------------------------------
    def _get_chunk_fn(self, n_steps: int, dt: float, record_energy: bool):
        key = (n_steps, dt, record_energy)
        if key in self._chunk_cache:
            return self._chunk_cache[key]

        one_step = make_integrator_step(
            self.force_fn, self.top.masses, self.top.dof_mask,
            self.cfg.integrator.kind, dt=dt,
            temp_target=self.cfg.temp_target,
            thermostat_tau=self.cfg.integrator.thermostat_tau,
            gamma=self.cfg.integrator.gamma,
            constrain_positions=self._cp, constrain_velocities=self._cv,
            n_constraints=self.n_constraints,
            external_forces_fn=self._external_forces_fn,
        )
        masses, dof_mask = self.top.masses, self.top.dof_mask
        zero_com = self.cfg.zero_com_drift
        baro = self.cfg.barostat_cfg

        def chunk(state: MdState):
            f0, (e0, _) = self.force_fn(
                state.positions, state.box, state.couple)
            if self._external_forces_fn is not None:
                f0 = f0 + self._external_forces_fn(state.positions)

            def body(carry, _):
                x, v, f, key, box = carry
                x, v, f, e, terms, key = one_step(
                    x, v, f, box, state.couple, key)
                if baro is not None:
                    from .barostat import berendsen_scale
                    x, box = berendsen_scale(
                        x, box, v, masses, dof_mask, terms, f,
                        baro.pressure_target, baro.tau, dt)
                out = (e,) if record_energy else ()
                return (x, v, f, key, box), out

            (x, v, f, key, box), outs = jax.lax.scan(
                body, (state.positions, state.velocities, f0,
                       state.rng_key, state.box),
                None, length=n_steps)
            if zero_com:
                v = remove_com_drift(v, masses, dof_mask)
            from .energy import apply_virtual_sites
            x = apply_virtual_sites(x, self.top)  # keep M-site rows live
            _, (e_final, terms) = self.force_fn(x, box, state.couple)
            ke = kinetic_energy(v, masses, dof_mask)
            dhdl = self.dhdl_fn(x, box, state.couple)
            new_state = state.replace(
                positions=x, velocities=v, box=box,
                step=state.step + n_steps, rng_key=key,
                pe_last=e_final, ke_last=ke, dhdl_last=dhdl,
            )
            return new_state, terms, (outs[0] if record_energy else None)

        fn = jax.jit(chunk)
        self._chunk_cache[key] = fn
        return fn

    def step(self, dt_ps: float, n_steps: int = 1, record_energy=False):
        """Advance n_steps of size dt_ps (reference: MdState::step,
        src/md/mod.rs:716 — dt in ps)."""
        t0 = time.perf_counter()
        fn = self._get_chunk_fn(n_steps, float(dt_ps), record_energy)
        self.state, terms, energies = fn(self.state)
        jax.block_until_ready(self.state.positions)
        self._wall_time += time.perf_counter() - t0
        self._last_terms = terms
        return energies

    def run(self, dt_ps: float, n_steps: int, snapshot_interval: Optional[int] = None,
            collect=True):
        """Blocking run (reference run_dynamics_blocking, src/md/mod.rs:696).

        Snapshots are appended to self.snapshots every `snapshot_interval`
        steps (cfg.snapshot_handlers.memory by default).
        """
        if snapshot_interval is None:
            snapshot_interval = self.cfg.snapshot_handlers.memory or n_steps
        chunk = min(self.cfg.steps_per_chunk, snapshot_interval)
        # align chunks to snapshot boundaries
        done = 0
        while done < n_steps:
            todo = min(chunk, n_steps - done)
            self.step(dt_ps, todo)
            done += todo
            if collect and (int(self.state.step) % snapshot_interval == 0):
                self._record_snapshot(dt_ps)
        return self.snapshots

    def _record_snapshot(self, dt_ps):
        from .snapshot import snapshot_from_state
        self.snapshots.append(
            snapshot_from_state(self.state, self.top, self._last_terms, dt_ps))

    def flush_snapshot_queues(self):
        """Parity with reference MdState::flush_snapshot_queues (:118)."""
        return self.snapshots

    def temperature(self) -> float:
        return float(instantaneous_temperature(
            self.state.velocities, self.top.masses, self.top.dof_mask,
            self.n_constraints))

    def potential_energy(self) -> float:
        e, _ = self.energy_fn(
            self.state.positions, self.state.box, self.state.couple)
        return float(e)

    def total_energy(self) -> float:
        return self.potential_energy() + float(kinetic_energy(
            self.state.velocities, self.top.masses, self.top.dof_mask))


def compute_energy_snapshot(top: Topology, cfg: MdConfig, x, box_extent=None,
                            method=None):
    """Single-point energy with per-term breakdown (reference
    compute_energy_snapshot, src/md/mod.rs:1036)."""
    sim_method = method or select_method(box_extent, x.shape[0], cfg)
    direct_fn = recip_fn = None
    if sim_method == "cells_pme":
        from ..ops.cells import make_cell_direct_space_fn
        from ..ops.pme import make_pme_recip_fn
        direct_fn = make_cell_direct_space_fn(
            top, cfg, np.asarray(box_extent), x0=np.asarray(x))
        recip_fn = make_pme_recip_fn(top, cfg, np.asarray(box_extent))
    e_fn = make_energy_fn(top, cfg, sim_method, pme_recip_fn=recip_fn,
                          direct_space_fn=direct_fn)
    dtype = jnp.dtype(cfg.dtype)
    box = None if box_extent is None else jnp.asarray(box_extent, dtype)
    e, terms = jax.jit(e_fn)(jnp.asarray(x, dtype), box,
                             jnp.asarray(1.0, dtype))
    return {k: float(v) for k, v in terms.items()}
