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


def _build_xla_energy(top, cfg, method, box_np, x0_np):
    """Reference XLA energy function for the given method."""
    direct_fn = recip_fn = None
    if method == "cells_pme":
        from ..ops.cells import make_cell_direct_space_fn
        from ..ops.pme import make_pme_recip_fn

        direct_fn = make_cell_direct_space_fn(top, cfg, box_np, x0=x0_np)
        recip_fn = make_pme_recip_fn(top, cfg, box_np)
    return make_energy_fn(top, cfg, method, pme_recip_fn=recip_fn,
                          direct_space_fn=direct_fn)


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
        # keep a host-side copy: casting/binning happens in numpy, and
        # device->host round-trips of freshly-put arrays can stall on
        # remote-compile backends
        x0_np = np.asarray(x0, dtype)
        x0 = jnp.asarray(x0_np)
        n = x0_np.shape[0]
        assert n == top.n_atoms, (n, top.n_atoms)
        self.method = method or select_method(box_extent, n, cfg)
        box_np = None if box_extent is None else np.asarray(box_extent, dtype)
        box = None if box_np is None else jnp.asarray(box_np)

        # --- constraints ---
        cp, cv, self.n_constraints = make_constraint_fns(top, cfg, box)
        self._cp, self._cv = cp, cv

        self._box_np = box_np
        self._build_force_paths(x0_np)

        self._external_forces_fn = external_forces_fn

        # --- state init ---
        # NOTE: everything device-side is jitted — on remote-compile backends
        # (axon tunnel) each eager op is an HTTP round-trip compile.
        key = jax.random.PRNGKey(cfg.seed)
        key, vkey = jax.random.split(key)
        if velocities is None:
            velocities = jax.jit(
                lambda k: init_velocities(
                    k, top.masses, top.dof_mask, cfg.temp_target, dtype)
            )(vkey)
        else:
            velocities = jnp.asarray(velocities, dtype)
        if cp is not None:
            x0 = jax.jit(cp)(x0, x0)

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
            x_min = self._relax_positions(box, cp,
                                          cfg.max_init_relaxation_iters)
            from .energy import apply_virtual_sites
            self.state = self.state.replace(
                positions=apply_virtual_sites(x_min, top))
            # re-plan cell capacity from the relaxed geometry: clash-inflated
            # occupancies would otherwise lock in an oversized (cap^2-cost)
            # window for the whole run
            self.rebuild_neighbor_plan()

    def _relax_positions(self, box, cp, n_iters):
        """FIRE relaxation. Prefers a jitted fori block (one dispatch per
        100 iterations); self-checks the first block's energy against the
        start — the remote AOT compiler has been seen to miscompile loop
        programs — and falls back to the host-loop variant if suspect."""
        from .minimize import fire_minimize, fire_minimize_hostloop

        x = self.state.positions
        couple = self.state.couple
        force_jit = jax.jit(self.force_fn)
        try:
            e0 = float(force_jit(x, box, couple)[1][0])
        except Exception:
            e0 = float("inf")
        block = min(n_iters, 100)
        n_blocks = max(1, -(-n_iters // block))
        fire_block = jax.jit(lambda xx: fire_minimize(
            self.force_fn, xx, box, couple, self.top.dof_mask,
            n_steps=block, constrain_positions=cp))
        ok = False
        try:
            x1, e1 = fire_block(x)
            e1 = float(e1)
            ok = np.isfinite(e1) and e1 <= e0 + max(abs(e0) * 0.01, 10.0)
        except Exception:
            ok = False
        if ok:
            x = x1
            for _ in range(n_blocks - 1):
                x, _ = fire_block(x)
            jax.block_until_ready(x)
            return x
        x_min, _ = fire_minimize_hostloop(
            self.force_fn, self.state.positions, box, couple,
            self.top.dof_mask, n_steps=n_iters, constrain_positions=cp)
        return x_min

    @property
    def _use_pallas(self):
        return self._nbr_backend == "pallas"

    @property
    def _hostloop_nbr(self):
        # backends that carry an explicit (rebuild -> aux) neighbor state and
        # therefore step via the per-step host loop
        return self._nbr_backend in ("pallas", "clusters")

    def rebuild_neighbor_plan(self):
        """Re-plan cell geometry/capacity from CURRENT positions and rebuild
        the force programs (use after large density changes or a cell-list
        overflow error)."""
        if self.method != "cells_pme":
            return
        jax.block_until_ready(self.state.positions)
        self._build_force_paths(np.asarray(self.state.positions))
        self._chunk_cache = {}

    def _build_force_paths(self, x0_np):
        top, cfg = self.top, self.cfg
        n = top.n_atoms
        box_np = self._box_np
        dtype = jnp.dtype(cfg.dtype)
        # Direct-space backends for cells_pme, by preference:
        #   'pallas'   fused TPU kernel (opt-in via cfg.use_pallas)
        #   'clusters' Morton-sorted cluster pair lists (default: pair count
        #              tracks true neighbors, not max-cell-occupancy^2)
        #   'window'   dense shift-window (validation / tiny systems)
        self._nbr_backend = None
        direct_fn = recip_fn = None
        self._force_nbr = None
        self._chunk_cache = {}
        use_direct_force = self.method == "cells_pme"
        cutoff = max(cfg.lj_cutoff, cfg.coulomb_cutoff)
        if self.method == "cells_pme":
            from ..ops.pme import ewald_beta_for, make_pme_recip_fn

            recip_fn = make_pme_recip_fn(top, cfg, box_np)
            want_pallas = (cfg.use_pallas and dtype == jnp.float32
                           and jax.default_backend() != "cpu")
            if want_pallas:
                from ..ops.pallas.direct_force import (
                    make_pallas_direct_fn,
                    make_rebuild_fn,
                    plan_window,
                )
                try:
                    plan = plan_window(
                        box_np, cutoff, top.n_atoms_real, n, x0=x0_np,
                        capacity_factor=cfg.cell_capacity_factor)
                    self._plan = plan
                    self._rebuild = make_rebuild_fn(plan, top.atom_mask)
                    pdirect = make_pallas_direct_fn(top, cfg, plan)
                    self._nbr_backend = "pallas"
                except AssertionError:
                    pass
            if self._nbr_backend is None and cfg.direct_backend != "window" \
                    and (box_np >= 2.0 * cutoff).all():
                from ..ops.clusters import (
                    make_cluster_direct_force_fn,
                    make_cluster_rebuild_fn,
                    plan_clusters,
                )
                plan = plan_clusters(box_np, cutoff, top.n_atoms_real, n,
                                     m_scale=getattr(self, "_m_scale", 1.0))
                self._plan = plan
                self._rebuild = make_cluster_rebuild_fn(plan, top)
                pdirect = make_cluster_direct_force_fn(top, cfg, plan)
                self._nbr_backend = "clusters"
            if self._nbr_backend is None:
                from ..ops.cells import make_xla_direct_force_fn
                pdirect = make_xla_direct_force_fn(top, cfg, box_np,
                                                   x0=x0_np)
                self._nbr_backend = "window"
            if use_direct_force:
                beta = ewald_beta_for(cfg.coulomb_cutoff, cfg.ewald_rtol)
                rest_e_fn = make_energy_fn(
                    top, cfg, "pme_rest", pme_recip_fn=recip_fn)
                rest_fg = make_force_fn(rest_e_fn)

                from .energy import apply_virtual_sites

                vs = top.vsite_idx
                vs_m, vs_o = vs[:, 0], vs[:, 1]
                vs_h1, vs_h2 = vs[:, 2], vs[:, 3]
                vs_w = top.vsite_weight[:, None]
                vs_mask = top.vsite_mask[:, None]

                def spread_vsite_forces(f):
                    """M = (1-2w) O + w H1 + w H2 is linear — spread the
                    kernel's M-site forces onto the parents exactly."""
                    if int(np.asarray(top.vsite_mask).sum()) == 0:
                        return f
                    fm = f[vs_m] * vs_mask
                    f = f.at[vs_m].add(-fm)
                    f = f.at[vs_o].add((1.0 - 2.0 * vs_w) * fm)
                    f = f.at[vs_h1].add(vs_w * fm)
                    f = f.at[vs_h2].add(vs_w * fm)
                    return f

                def force_nbr(x, box, couple, slot_atom, inv_slot):
                    x = apply_virtual_sites(x, top)  # M tracks O/H1/H2
                    f1, e_lj, e_c, ovf_d = pdirect(
                        x, box, couple, beta, slot_atom, inv_slot)
                    f1 = spread_vsite_forces(f1)
                    f2, (e_rest, terms) = rest_fg(x, box, couple)
                    e_tot = e_rest + e_lj + e_c
                    terms = dict(terms)
                    terms["lj"] = terms["lj"] + e_lj
                    terms["coulomb"] = terms["coulomb"] + e_c
                    terms["energy_potential"] = e_tot
                    terms["energy_potential_nonbonded"] = (
                        terms["energy_potential_nonbonded"] + e_lj + e_c)
                    terms["cell_overflow"] = (
                        terms.get("cell_overflow", 0) + ovf_d)
                    return f1 + f2, (e_tot, terms)

                self._force_nbr = force_nbr
                if self._hostloop_nbr:
                    rebuild = self._rebuild

                    def force_fn(x, box, couple):
                        sa, inv, _ = rebuild(x, box)
                        return force_nbr(x, box, couple, sa, inv)
                else:
                    def force_fn(x, box, couple):
                        return force_nbr(x, box, couple, None, None)

                self.force_fn = force_fn
                self.energy_fn = lambda x, box, couple: force_fn(
                    x, box, couple)[1]
                has_alch = bool(np.asarray(top.couple_mask).sum() > 0)
                if has_alch:
                    def dhdl_fn(x, box, couple):
                        h = jnp.asarray(1e-3, x.dtype)
                        ep = force_fn(x, box, couple + h)[1][0]
                        em = force_fn(x, box, couple - h)[1][0]
                        return -(ep - em) / (2.0 * h)  # d/dlambda = -d/dcouple
                else:
                    def dhdl_fn(x, box, couple):
                        return jnp.zeros((), x.dtype)
                self.dhdl_fn = dhdl_fn
        if not use_direct_force:
            self.energy_fn = make_energy_fn(
                top, cfg, self.method, pme_recip_fn=recip_fn,
                direct_space_fn=direct_fn,
            )
            self.force_fn = make_force_fn(self.energy_fn)
            self.dhdl_fn = make_dhdl_fn(self.energy_fn)

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
    def _make_one_step(self, dt: float, force_fn, force_cap=None):
        return make_integrator_step(
            force_fn, self.top.masses, self.top.dof_mask,
            self.cfg.integrator.kind, dt=dt,
            temp_target=self.cfg.temp_target,
            thermostat_tau=self.cfg.integrator.thermostat_tau,
            gamma=self.cfg.integrator.gamma,
            constrain_positions=self._cp, constrain_velocities=self._cv,
            n_constraints=self.n_constraints,
            external_forces_fn=self._external_forces_fn,
            force_cap=force_cap,
            cadence=self.cfg.integrator.cadence,
        )

    # ------------------------------------------------------------------
    # Pallas path: one jitted program per step, driven by a host loop.
    #
    # The axon remote AOT compiler has been observed to miscompile or crash
    # on complex programs that nest the Pallas custom call inside long
    # lax.scan/fori loops (validated piecewise: the same math in a host loop
    # is correct). Keeping the kernel at the top level of a single-step
    # program sidesteps that; per-dispatch overhead is small relative to the
    # step cost at production sizes.
    # ------------------------------------------------------------------
    def _get_step_fns(self, dt: float, force_cap=None):
        key = ("step", dt, force_cap)
        if key in self._chunk_cache:
            return self._chunk_cache[key]
        rebuild = self._rebuild
        force_nbr = self._force_nbr

        def one(x, v, f, key_, box, couple, sa, inv):
            one_step = self._make_one_step(
                dt, lambda x_, b_, c_: force_nbr(x_, b_, c_, sa, inv),
                force_cap)
            x, v, f, e, terms, key_ = one_step(x, v, f, box, couple, key_)
            return x, v, f, e, key_

        def first_force(x, box, couple, sa, inv):
            f, (e, terms) = force_nbr(x, box, couple, sa, inv)
            if self._external_forces_fn is not None:
                f = f + self._external_forces_fn(x)
            return f

        fns = (jax.jit(one), jax.jit(first_force), jax.jit(rebuild))
        self._chunk_cache[key] = fns
        return fns

    def _step_pallas_hostloop(self, dt_ps: float, n_steps: int,
                              record_energy: bool, force_cap):
        one, first_force, rebuild_jit = self._get_step_fns(
            float(dt_ps), force_cap)
        s = self.state
        x, v, key, box, couple = (s.positions, s.velocities, s.rng_key,
                                  s.box, s.couple)
        k_rebuild = self.cfg.neighbor_rebuild_every
        sa = inv = None
        f = None
        energies = []
        ovf_all = []
        for i in range(n_steps):
            if i % k_rebuild == 0:
                sa, inv, ovf = rebuild_jit(x, box)
                ovf_all.append(ovf)
                f = first_force(x, box, couple, sa, inv)
            x, v, f, e, key = one(x, v, f, key, box, couple, sa, inv)
            if record_energy:
                energies.append(e)
            if i % 64 == 63:
                jax.block_until_ready(x)   # keep dispatch queue shallow
        jax.block_until_ready(x)
        # max over ALL rebuilds in this chunk, not just the last one — a
        # transient mid-run overflow silently drops pairs (advisor finding)
        ovf_max = int(jnp.max(jnp.stack(ovf_all)))
        if self.cfg.zero_com_drift:
            v = jax.jit(lambda v: remove_com_drift(
                v, self.top.masses, self.top.dof_mask))(v)
        from .energy import apply_virtual_sites
        fin = self._get_finalize_fn()
        x, e_final, terms, ke, dhdl = fin(x, v, box, couple)
        self.state = s.replace(
            positions=x, velocities=v, box=box,
            step=s.step + n_steps, rng_key=key,
            pe_last=e_final, ke_last=ke, dhdl_last=dhdl)
        self._last_terms = terms
        if ovf_max > 0:
            raise RuntimeError(
                f"cell-list overflow: {ovf_max} atoms dropped from binning")
        return jnp.stack(energies) if record_energy and energies else None

    def _get_finalize_fn(self):
        if "finalize" in self._chunk_cache:
            return self._chunk_cache["finalize"]
        from .energy import apply_virtual_sites

        def fin(x, v, box, couple):
            x = apply_virtual_sites(x, self.top)
            _, (e_final, terms) = self.force_fn(x, box, couple)
            ke = kinetic_energy(v, self.top.masses, self.top.dof_mask)
            dhdl = self.dhdl_fn(x, box, couple)
            return x, e_final, terms, ke, dhdl

        fn = jax.jit(fin)
        self._chunk_cache["finalize"] = fn
        return fn

    def _get_chunk_fn(self, n_steps: int, dt: float, record_energy: bool,
                      force_cap=None):
        key = (n_steps, dt, record_energy, force_cap)
        if key in self._chunk_cache:
            return self._chunk_cache[key]

        masses, dof_mask = self.top.masses, self.top.dof_mask
        zero_com = self.cfg.zero_com_drift
        baro = self.cfg.barostat_cfg

        # block structure: with the Pallas backend, cell binning is refreshed
        # every `neighbor_rebuild_every` steps; one chunk = n_blocks blocks.
        if self._hostloop_nbr:
            k_steps = min(self.cfg.neighbor_rebuild_every, n_steps)
            n_blocks = max(n_steps // k_steps, 1)
            n_steps = n_blocks * k_steps
        else:
            k_steps, n_blocks = n_steps, 1

        def make_inner(force_fn):
            one_step = self._make_one_step(dt, force_fn, force_cap)

            def inner(x, v, key, box, couple):
                f0, _ = force_fn(x, box, couple)
                if self._external_forces_fn is not None:
                    f0 = f0 + self._external_forces_fn(x)

                def body(carry, _):
                    x, v, f, key, box = carry
                    x, v, f, e, terms, key = one_step(
                        x, v, f, box, couple, key)
                    out = (e,) if record_energy else ()
                    return (x, v, f, key, box), out

                # Small systems are dominated by in-scan per-op issue
                # latency (~140 us/step at 33 atoms on a TPU, round-4
                # PERF): unrolling the scan body lets XLA fuse elementwise
                # chains ACROSS steps, cutting the op count per step.
                # Auto-on below 512 atoms; env-overridable.
                import os as _os
                unroll = int(_os.environ.get(
                    "MOLCHANICA_SCAN_UNROLL",
                    "8" if self.top.n_atoms_real < 512 else "1"))
                unroll = max(min(unroll, k_steps), 1)
                (x, v, f, key, box), outs = jax.lax.scan(
                    body, (x, v, f0, key, box), None, length=k_steps,
                    unroll=unroll)
                if baro is not None:
                    # chunk-boundary weak coupling with the EXACT scaling
                    # virial (see md/barostat.py); tau >> k_steps * dt so
                    # the coupling integral is unchanged. The virial is
                    # dE/ds via jax.grad; pallas_call has no VJP, so with
                    # the Pallas backend the pressure is evaluated through
                    # a separate all-XLA energy function instead.
                    from .barostat import berendsen_scale_chunk
                    if self._use_pallas:
                        if not hasattr(self, "_baro_e_fn"):
                            self._baro_e_fn = _build_xla_energy(
                                self.top, self.cfg, self.method,
                                self._box_np,
                                np.asarray(self.state.positions))
                        e_scalar = lambda x_, b_, c_: \
                            self._baro_e_fn(x_, b_, c_)[0]
                    else:
                        e_scalar = lambda x_, b_, c_: \
                            force_fn(x_, b_, c_)[1][0]
                    x, box, _p = berendsen_scale_chunk(
                        e_scalar, x, v=v, box=box, masses=masses,
                        dof_mask=dof_mask, couple=couple,
                        pressure_target_bar=baro.pressure_target,
                        tau_ps=baro.tau, dt_eff_ps=dt * k_steps,
                        mol_id=self.top.mol_id, n_mol=self.top.n_mol)
                    if self._cp is not None:
                        x = self._cp(x, x)
                return x, v, key, box, (outs[0] if record_energy else None)

            return inner

        def chunk(state: MdState):
            couple = state.couple
            if self._hostloop_nbr:
                rebuild = self._rebuild
                force_nbr = self._force_nbr

                def outer(carry, _):
                    x, v, key, box = carry
                    sa, inv, ovf = rebuild(x, box)
                    inner = make_inner(
                        lambda x_, b_, c_: force_nbr(x_, b_, c_, sa, inv))
                    x, v, key, box, outs = inner(x, v, key, box, couple)
                    return (x, v, key, box), (outs, ovf)

                (x, v, key, box), (outs, ovfs) = jax.lax.scan(
                    outer, (state.positions, state.velocities,
                            state.rng_key, state.box),
                    None, length=n_blocks)
                energies = (outs.reshape(-1) if record_energy else None)
                max_ovf = jnp.max(ovfs)
            else:
                inner = make_inner(self.force_fn)
                x, v, key, box, energies = inner(
                    state.positions, state.velocities, state.rng_key,
                    state.box, couple)

            if zero_com:
                v = remove_com_drift(v, masses, dof_mask)
            from .energy import apply_virtual_sites
            x = apply_virtual_sites(x, self.top)  # keep M-site rows live
            _, (e_final, terms) = self.force_fn(x, box, couple)
            if self._hostloop_nbr:
                terms = dict(terms, cell_overflow=max_ovf)
            ke = kinetic_energy(v, masses, dof_mask)
            dhdl = self.dhdl_fn(x, box, couple)
            new_state = state.replace(
                positions=x, velocities=v, box=box,
                step=state.step + n_steps, rng_key=key,
                pe_last=e_final, ke_last=ke, dhdl_last=dhdl,
            )
            return new_state, terms, energies

        fn = jax.jit(chunk)
        self._chunk_cache[key] = fn
        return fn

    def step(self, dt_ps: float, n_steps: int = 1, record_energy=False,
             force_cap=None):
        """Advance n_steps of size dt_ps (reference: MdState::step,
        src/md/mod.rs:716 — dt in ps). `force_cap` clamps per-atom forces
        (kcal/mol/A) — equilibration aid.

        Requests larger than cfg.steps_per_chunk are split into
        steps_per_chunk-sized dispatches: the chunk program's cache key
        includes its length, so varying request sizes would otherwise
        recompile (~20-40 s on the remote TPU compiler) instead of reusing
        the warm program."""
        spc = self.cfg.steps_per_chunk
        if n_steps > spc and not (self._hostloop_nbr
                                  and not self.cfg.use_scan_chunks):
            energies = []
            done = 0
            while done < n_steps:
                todo = min(spc, n_steps - done)
                e = self.step(dt_ps, todo, record_energy, force_cap)
                if record_energy and e is not None:
                    energies.append(e)
                done += todo
            if record_energy:
                return jnp.concatenate(energies) if energies else None
            return None
        t0 = time.perf_counter()
        self._sim_time_ps = getattr(self, "_sim_time_ps", 0.0) \
            + dt_ps * n_steps
        if self._hostloop_nbr and not self.cfg.use_scan_chunks:
            for attempt in range(3):
                saved = self.state
                try:
                    energies = self._step_pallas_hostloop(
                        dt_ps, n_steps, record_energy, force_cap)
                    break
                except RuntimeError as e:
                    if "overflow" not in str(e) or attempt == 2:
                        raise
                    # neighbor-list width too small for the current density:
                    # grow, replan from the saved state, retry the chunk
                    self.state = saved
                    self._m_scale = getattr(self, "_m_scale", 1.0) * 1.5
                    self.rebuild_neighbor_plan()
            jax.block_until_ready(self.state.positions)
            self._wall_time += time.perf_counter() - t0
            return energies
        for attempt in range(3):
            saved = self.state
            fn = self._get_chunk_fn(n_steps, float(dt_ps), record_energy,
                                    force_cap)
            self.state, terms, energies = fn(self.state)
            if self._hostloop_nbr:
                ovf = int(terms.get("cell_overflow", 0))
                if ovf > 0 and attempt < 2:
                    # neighbor-list width too small: grow, replan from the
                    # saved state, retry the chunk
                    self.state = saved
                    self._m_scale = getattr(self, "_m_scale", 1.0) * 1.5
                    self.rebuild_neighbor_plan()
                    continue
                if ovf > 0:
                    raise RuntimeError(
                        f"neighbor-list overflow ({ovf}) persisted after "
                        "replans")
            break
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
        import contextlib

        import jax as _jax
        trace = (_jax.profiler.trace(self.cfg.trace_dir)
                 if self.cfg.trace_dir else contextlib.nullcontext())
        if snapshot_interval is None:
            snapshot_interval = self.cfg.snapshot_handlers.memory or n_steps
        chunk = min(self.cfg.steps_per_chunk, snapshot_interval)
        # align chunks to snapshot boundaries
        done = 0
        with trace:
            while done < n_steps:
                todo = min(chunk, n_steps - done)
                self.step(dt_ps, todo)
                done += todo
                if collect and done % snapshot_interval == 0:
                    self._record_snapshot(dt_ps)
        return self.snapshots

    def metrics(self) -> dict:
        """Structured run metrics (step rate as a first-class metric —
        SURVEY §5 metrics/observability)."""
        wall = max(self._wall_time, 1e-12)
        sim_ps = getattr(self, "_sim_time_ps", 0.0)
        return {
            "steps": int(self.step_count),
            "wall_s": round(wall, 4),
            "sim_ps": round(sim_ps, 4),
            "ms_per_step": round(1000.0 * wall
                                 / max(int(self.step_count), 1), 4),
            "ns_per_day": round(sim_ps / 1000.0 / wall * 86400.0, 3),
            "n_sites": int(self.top.n_atoms_real),
        }

    def _record_snapshot(self, dt_ps):
        from .snapshot import snapshot_from_state
        self.snapshots.append(
            snapshot_from_state(self.state, self.top, self._last_terms, dt_ps))

    def flush_snapshot_queues(self):
        """Parity with reference MdState::flush_snapshot_queues (:118)."""
        return self.snapshots

    def temperature(self) -> float:
        import numpy as _np
        from ..constants import ACCEL_FACTOR, KB
        v = _np.asarray(self.state.velocities)
        m = _np.asarray(self.top.masses)
        d = _np.asarray(self.top.dof_mask)
        ke = 0.5 * float((m * d * (v * v).sum(-1)).sum()) / ACCEL_FACTOR
        ndof = max(3.0 * d.sum() - self.n_constraints - 3.0, 1.0)
        return 2.0 * ke / (KB * ndof)

    def _jitted_energy(self):
        # NOTE: jit the FULL force program and drop the forces on the host.
        # Compiling an energy-only variant (forces DCE'd) has been observed
        # to miscompile on the axon remote-compile backend (wrong bond/recip
        # values); the full program is correct and the extra cost is
        # irrelevant at the call frequency of energy queries.
        if not hasattr(self, "_energy_jit"):
            force_jit = jax.jit(self.force_fn)
            self._energy_jit = lambda x, b, c: force_jit(x, b, c)[1]
        return self._energy_jit

    def potential_energy(self) -> float:
        e, _ = self._jitted_energy()(
            self.state.positions, self.state.box, self.state.couple)
        return float(e)

    def total_energy(self) -> float:
        import numpy as _np
        from ..constants import ACCEL_FACTOR
        v = _np.asarray(self.state.velocities)
        m = _np.asarray(self.top.masses)
        d = _np.asarray(self.top.dof_mask)
        ke = 0.5 * float((m * d * (v * v).sum(-1)).sum()) / ACCEL_FACTOR
        return self.potential_energy() + ke


def compute_energy_snapshot(top: Topology, cfg: MdConfig, x, box_extent=None,
                            method=None, couple=1.0):
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
                             jnp.asarray(couple, dtype))
    return {k: float(v) for k, v in terms.items()}
