"""FastSim (sorted-state colpair engine) vs MdSim reference.

Runs on the CPU test mesh with the kernel in interpret mode: validates the
full chain — sort/rebuild/index-remap, kernel + PME + bonded + exclusion
subtraction, SETTLE + star M-SHAKE, vsite spreading — against the
independent MdSim implementation and against physical invariants.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molchanica_tpu.md.config import HydrogenConstraint, Integrator, MdConfig
from molchanica_tpu.md.engine import MdSim
from molchanica_tpu.md.fast_engine import FastSim
from molchanica_tpu.molecules.spec import assemble_system
from molchanica_tpu.systems.bench_systems import build_solvated_protein
from molchanica_tpu.systems.water import OPC

pytestmark = pytest.mark.heavy  # minutes-per-test CPU tier (see README)


def _cfg(**kw):
    base = dict(
        integrator=Integrator.langevin_middle(gamma=2.0),
        temp_target=300.0, lj_cutoff=6.0, coulomb_cutoff=6.0,
        hydrogen_constraint=HydrogenConstraint.shake(),
        dtype="float32", max_init_relaxation_iters=None,
        pme_grid=(24, 24, 24), seed=3, neighbor_rebuild_every=8,
    )
    base.update(kw)
    return MdConfig(**base)


@pytest.fixture(scope="module")
def water_box():
    box = np.array([24.0, 24.0, 24.0])
    return assemble_system([], box_extent=box, water_model=OPC,
                           n_waters=250, seed=0), box


def test_fast_energy_matches_mdsim_water(water_box):
    asys, box = water_box
    cfg = _cfg()
    ref = MdSim(asys.topology, cfg, asys.positions, box_extent=box,
                method="cells_pme", relax=False)
    fast = FastSim(asys.topology, cfg, asys.positions, box_extent=box)
    e_ref = ref.potential_energy()
    e_fast = fast.potential_energy()
    assert abs(e_fast - e_ref) / abs(e_ref) < 1e-3


def test_fast_forces_match_mdsim_peptide():
    asys = build_solvated_protein(n_residues=8, box_side=24.0, seed=3)
    cfg = _cfg(temp_target=310.0)
    ref = MdSim(asys.topology, cfg, asys.positions,
                box_extent=asys.box_extent, method="cells_pme", relax=False)
    fast = FastSim(asys.topology, cfg, asys.positions,
                   box_extent=asys.box_extent)
    f_ref = np.asarray(jax.jit(ref.force_fn)(
        ref.state.positions, ref.state.box, ref.state.couple)[0])
    st = fast.state
    force = fast._make_force_fn(None)
    f_fast_s = np.asarray(jax.jit(lambda x, s: force(x, s))(st.x, st)[0])
    F = np.zeros((fast.n_base + 1, 3))
    F[np.asarray(st.perm)] = f_fast_s
    n_real = asys.topology.n_atoms_real
    scale = np.abs(f_ref).max()
    # clash-clamp policies differ between the engines (LJ_CLIP vs 0.45-sigma
    # floor), so on this unrelaxed synthetic start agreement is a few percent
    assert np.abs(F[:n_real] - f_ref[:n_real]).max() / scale < 0.05


def test_fast_dynamics_water_settle(water_box):
    asys, box = water_box
    # Init relaxation on (reference default): dynamics from an unminimized
    # random packing converts clash PE into a >900 K kinetic transient,
    # which is a property of the start, not of the integrator.
    cfg = _cfg(max_init_relaxation_iters=64)
    fast = FastSim(asys.topology, cfg, asys.positions, box_extent=box)
    fast.step(0.001, 60)
    top = asys.topology
    x = fast.positions_unsorted()
    wc, ws, stride = top.water_count, top.water_start, top.water_site_count
    w = x[ws:ws + wc * stride].reshape(wc, stride, 3)
    d = w[:, 0] - w[:, 1]
    d -= box * np.round(d / box)
    assert np.abs(np.linalg.norm(d, axis=1) - top.water_r_oh).max() < 1e-3
    assert 100 < fast.temperature() < 900
    assert np.isfinite(fast.potential_energy())


def test_fast_rebuild_identity():
    """Two consecutive rebuilds must leave physics unchanged."""
    box = np.array([24.0, 24.0, 24.0])
    asys = assemble_system([], box_extent=box, water_model=OPC,
                           n_waters=200, seed=1)
    cfg = _cfg()
    fast = FastSim(asys.topology, cfg, asys.positions, box_extent=box)
    e1 = fast.potential_energy()
    fast.state = fast._rebuild_jit(fast.state)
    e2 = fast.potential_energy()
    assert abs(e1 - e2) < 1e-2


def test_fast_water_blocks_stay_contiguous(water_box):
    """Layout v3 invariant: every water occupies consecutive sorted slots
    (O, H1, H2, M) after ANY number of rebuilds — the rolled SETTLE /
    vsite / intra-water paths silently corrupt geometry if this breaks.
    Regression for the role-tie-break interleaving bug (two waters in one
    z-bin must stay blocked via sort stability, not tie-break bits)."""
    asys, box = water_box
    cfg = _cfg(neighbor_rebuild_every=4)
    fast = FastSim(asys.topology, cfg, asys.positions, box_extent=box)
    fast.step(0.001, 12)      # several rebuilds with real motion
    widx = np.asarray(fast.state.widx)
    assert ((widx[:, 1] - widx[:, 0]) == 1).all()
    assert ((widx[:, 2] - widx[:, 0]) == 2).all()
    # roles in the merge tables match the block structure
    w_role = np.asarray(fast.state.w_role)
    assert (w_role[widx[:, 0]] == 0).all()
    assert (w_role[widx[:, 1]] == 1).all()
    assert (w_role[widx[:, 2]] == 2).all()
    # M sites directly follow their block (vsite rows are (m, o, h1, h2);
    # padded rows point at the dummy slot S and are skipped)
    vs = np.asarray(fast.state.vsite_idx)
    real = vs[:, 1] < fast.S
    assert real.any()
    assert (vs[real, 0] == vs[real, 1] + 3).all()


def test_fast_forces_match_mdsim_relaxed_tight(water_box):
    """VERDICT r2 #7: on a RELAXED configuration (clash clamps inactive)
    the two engines' forces must agree to ~1e-4 of the force scale, so
    they cannot silently drift apart during optimization."""
    asys, box = water_box
    cfg = _cfg()
    fast = FastSim(asys.topology, cfg, asys.positions, box_extent=box)
    fast.minimize(64)
    x_rel = fast.positions_unsorted()
    ref = MdSim(asys.topology, cfg, x_rel, box_extent=box,
                method="cells_pme", relax=False)
    f_ref = np.asarray(jax.jit(ref.force_fn)(
        ref.state.positions, ref.state.box, ref.state.couple)[0])
    st = fast.state
    force = fast._make_force_fn(None)
    f_fast_s = np.asarray(jax.jit(lambda x, s: force(x, s))(st.x, st)[0])
    F = np.zeros((fast.n_base + 1, 3))
    F[np.asarray(st.perm)] = f_fast_s
    n_real = asys.topology.n_atoms_real
    scale = np.abs(f_ref).max()
    assert scale > 0
    rel = np.abs(F[:n_real] - f_ref[:n_real]).max() / scale
    assert rel < 2e-4, f"relaxed-config force disagreement {rel:.2e}"


def test_fast_overflow_auto_replan(water_box):
    """Window-table overflow recovery: an engine planned with a
    deliberately undersized per-slice window capacity must detect the
    overflow, restore the call-entry state, replan with doubled capacity,
    and finish the run — ending statistically identical to an engine
    planned wide from the start (failure-detection/recovery, SURVEY section 5;
    the reference's replan-on-overflow analog in dynamics' neighbor build).
    """
    asys, box = water_box
    cfg = _cfg(seed=11)
    wide = FastSim(asys.topology, cfg, asys.positions, box_extent=box)
    v0 = wide.velocities_unsorted()
    wide.step(0.002, 16)

    # capacity 8 slice entries/cluster: the 3x3 window needs ~2x that
    # here, so the first rebuild overflows deterministically
    tight = FastSim(asys.topology, cfg, asys.positions, box_extent=box,
                    velocities=v0, per_slice_k=8)
    tight.step(0.002, 16)                      # must not raise
    assert tight._psk > 8                      # replan widened the table
    assert int(tight.state.overflow) == 0
    assert tight.step_count == 16
    e_w = wide.potential_energy()
    e_t = tight.potential_energy()
    assert np.isfinite(e_t)
    # same seed + velocities + exact recovery => same trajectory up to
    # f32 accumulation-order noise in the differently-shaped kernel
    assert abs(e_t - e_w) / abs(e_w) < 5e-3, (e_t, e_w)


def test_fast_overflow_chunk_granular_resume(water_box, monkeypatch):
    """VERDICT r4 ask #7: overflow detected mid-request must resume from
    the last good dispatch boundary, NOT redo the whole call. Injects a
    window-overflow flag into the 3rd dispatch's output and counts steps
    actually executed: the redo must cost at most 2 dispatches (the
    corrupted one plus the one already in flight when its verification
    ran — overflow checks trail one dispatch so the device pipeline never
    stalls)."""
    asys, box = water_box
    cfg = _cfg(seed=12, neighbor_rebuild_every=4)
    monkeypatch.setenv("MOLCHANICA_CHUNK_PERIODS", "2")  # 8-step dispatches

    ref = FastSim(asys.topology, cfg, asys.positions, box_extent=box)
    v0 = ref.velocities_unsorted()
    ref.step(0.002, 40)

    sim = FastSim(asys.topology, cfg, asys.positions, box_extent=box,
                  velocities=v0)
    executed = []          # steps per dispatch, across replans
    injected = []
    orig_get = FastSim._get_chunk_fn

    def patched_get(self, dt, k, rec, cap, periods=1):
        fn = orig_get(self, dt, k, rec, cap, periods)

        def wrapped(st):
            st2, terms, es = fn(st)
            executed.append(k * periods)
            if len(executed) == 3 and not injected:
                injected.append(True)    # fake a window-table overflow
                st2 = st2.replace(overflow=st2.overflow | (1 << 15))
            return st2, terms, es

        return wrapped

    monkeypatch.setattr(FastSim, "_get_chunk_fn", patched_get)
    psk0 = sim._psk
    sim.step(0.002, 40)
    assert injected
    assert sim.step_count == 40
    assert sim._psk == 2 * psk0          # window flag -> widened tables
    # banked 16 good steps; redo budget: the 8-step corrupted dispatch +
    # the 8-step in-flight dispatch, nothing more
    assert sum(executed) - 40 <= 16, executed
    e_i = sim.potential_energy()
    e_r = ref.potential_energy()
    assert abs(e_i - e_r) / abs(e_r) < 5e-3, (e_i, e_r)


def test_fast_sim_time_credits_only_completed_steps(water_box, monkeypatch):
    """Advisor r4: _sim_time_ps must reflect steps actually completed,
    including across a mid-call overflow recovery (no double credit, no
    credit for discarded dispatches)."""
    asys, box = water_box
    cfg = _cfg(seed=13, neighbor_rebuild_every=4)
    monkeypatch.setenv("MOLCHANICA_CHUNK_PERIODS", "2")
    sim = FastSim(asys.topology, cfg, asys.positions, box_extent=box)
    count = [0]
    orig_get = FastSim._get_chunk_fn

    def patched_get(self, dt, k, rec, cap, periods=1):
        fn = orig_get(self, dt, k, rec, cap, periods)

        def wrapped(st):
            st2, terms, es = fn(st)
            count[0] += 1
            if count[0] == 2:
                st2 = st2.replace(overflow=st2.overflow | (1 << 15))
            return st2, terms, es

        return wrapped

    monkeypatch.setattr(FastSim, "_get_chunk_fn", patched_get)
    sim.step(0.002, 24)
    assert sim.step_count == 24
    assert abs(sim._sim_time_ps - 24 * 0.002) < 1e-9
