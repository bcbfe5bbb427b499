"""Run configuration: the TPU-native analog of the reference's `MdConfig`.

API parity targets (observed surface of the external `dynamics` crate, see
/root/repo/SURVEY.md §2.1 and the reference call sites cited per field):
`MdConfig`, `Integrator`, `HydrogenConstraint`, `Solvent`, `SimBoxInit`,
`MdOverrides`, `SnapshotHandlers`, `BarostatCfg`.

These are host-side (static) dataclasses; anything traced lives in MdState.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

from ..constants import (
    LANGEVIN_GAMMA_DEFAULT,
    LINCS_ITER_DEFAULT,
    LINCS_ORDER_DEFAULT,
    PRESSURE_DEFAULT,
    SHAKE_TOL_DEFAULT,
    TAU_PRESSURE_DEFAULT,
    TAU_TEMP_DEFAULT,
    TEMP_TARGET_DEFAULT,
)


# --- Integrators (ref: src/state.rs:837-845, src/ui/panels/md.rs:293-303) ---
@dataclass(frozen=True)
class Integrator:
    kind: str = "verlet_velocity"   # "leapfrog" | "verlet_velocity" | "langevin_middle"
    thermostat_tau: Optional[float] = TAU_TEMP_DEFAULT  # CSVR tau (ps); None = NVE
    gamma: float = LANGEVIN_GAMMA_DEFAULT               # Langevin friction 1/ps
    # Constraint cadence for langevin_middle (rigid water / H clusters):
    #   "light"  — the OpenMM LangevinMiddle schedule: one velocity
    #              projection after the kick, one position projection (with
    #              velocity feedback) after the last half-drift. The
    #              production default: ~2 ms/step cheaper at 25k sites and
    #              the industry-standard cadence for rigid-water MD.
    #   "strict" — g-BAOAB: projection after EVERY substep (2 position +
    #              3 velocity per step). Reference-quality for constraint
    #              statistics studies.
    cadence: str = "light"

    @staticmethod
    def leapfrog(thermostat: Optional[float] = TAU_TEMP_DEFAULT):
        return Integrator("leapfrog", thermostat_tau=thermostat)

    @staticmethod
    def verlet_velocity(thermostat: Optional[float] = TAU_TEMP_DEFAULT):
        return Integrator("verlet_velocity", thermostat_tau=thermostat)

    @staticmethod
    def langevin_middle(gamma: float = LANGEVIN_GAMMA_DEFAULT,
                        cadence: str = "light"):
        return Integrator("langevin_middle", thermostat_tau=None,
                          gamma=gamma, cadence=cadence)


# --- H constraints (ref: src/ui/panels/md.rs:358-370) ---
@dataclass(frozen=True)
class HydrogenConstraint:
    kind: str = "shake"   # "linear" (LINCS-like) | "shake" | "flexible"
    order: int = LINCS_ORDER_DEFAULT
    iters: int = LINCS_ITER_DEFAULT
    shake_tolerance: float = SHAKE_TOL_DEFAULT
    shake_max_iters: int = 25

    @staticmethod
    def linear(order: int = LINCS_ORDER_DEFAULT, iters: int = LINCS_ITER_DEFAULT):
        return HydrogenConstraint("linear", order=order, iters=iters)

    @staticmethod
    def shake(tol: float = SHAKE_TOL_DEFAULT):
        return HydrogenConstraint("shake", shake_tolerance=tol)

    @staticmethod
    def flexible():
        return HydrogenConstraint("flexible")


# --- Solvent (ref: src/gromacs/mod.rs:101-112; OPC water README.md:230) ---
@dataclass(frozen=True)
class Solvent:
    kind: str = "none"   # none | water_opc | water_opc_mol_count | water_tip3p | octanol_with_water
    mol_count: Optional[int] = None
    water_fraction: float = 0.27  # octanol mix: 27 mol% water (src/properties/logp.rs:40-44)

    @staticmethod
    def none():
        return Solvent("none")

    @staticmethod
    def water_opc():
        return Solvent("water_opc")

    @staticmethod
    def water_opc_specify_mol_count(n: int):
        return Solvent("water_opc_mol_count", mol_count=n)

    @staticmethod
    def water_tip3p():
        return Solvent("water_tip3p")

    @staticmethod
    def octanol_with_water(water_fraction: float = 0.27):
        return Solvent("octanol_with_water", water_fraction=water_fraction)


# --- Simulation box init (ref: src/state.rs:858-871) ---
@dataclass(frozen=True)
class SimBoxInit:
    kind: str = "pad"     # "pad" | "fixed"
    pad: float = 10.0     # A of padding around solute
    bounds: Optional[Tuple[Tuple[float, float, float], Tuple[float, float, float]]] = None

    @staticmethod
    def pad_(p: float):
        return SimBoxInit("pad", pad=p)

    @staticmethod
    def fixed(lo, hi):
        return SimBoxInit("fixed", bounds=(tuple(lo), tuple(hi)))

    @staticmethod
    def new_cube(side: float):
        h = side / 2.0
        return SimBoxInit.fixed((-h, -h, -h), (h, h, h))


@dataclass(frozen=True)
class BarostatCfg:
    """Berendsen-style tau-coupled barostat (ref: src/state.rs:850-856)."""
    pressure_target: float = PRESSURE_DEFAULT   # bar
    tau: float = TAU_PRESSURE_DEFAULT           # ps


@dataclass(frozen=True)
class MdOverrides:
    """Per-term ablation switches (ref: src/md/mod.rs:672-681) — first-class
    config for validating individual physical processes."""
    skip_water: bool = False
    skip_water_relaxation: bool = False
    bonded_disabled: bool = False
    coulomb_disabled: bool = False
    lj_disabled: bool = False
    long_range_recip_disabled: bool = False
    snapshots_during_equilibration: bool = False


@dataclass(frozen=True)
class OutputControl:
    """GROMACS-style output cadence (ref: src/state.rs:873-881)."""
    nstxout: int = 0
    nstvout: int = 0
    nstfout: int = 0
    nstenergy: int = 100
    nstcalcenergy: int = 100
    nstxout_compressed: int = 0


@dataclass(frozen=True)
class SnapshotHandlers:
    """Where snapshots go (ref: src/state.rs:873-881)."""
    memory: Optional[int] = 100           # interval in steps, None = off
    dcd: Optional[str] = None             # path
    gromacs: OutputControl = field(default_factory=OutputControl)


@dataclass(frozen=True)
class MdConfig:
    """Full run configuration (ref: SURVEY §2.1 MdConfig field list)."""
    integrator: Integrator = field(default_factory=Integrator)
    temp_target: float = TEMP_TARGET_DEFAULT
    barostat_cfg: Optional[BarostatCfg] = None
    sim_box: SimBoxInit = field(default_factory=lambda: SimBoxInit("pad", pad=10.0))
    solvent: Solvent = field(default_factory=Solvent.none)
    hydrogen_constraint: HydrogenConstraint = field(default_factory=HydrogenConstraint)
    coulomb_cutoff: float = 9.0       # A (direct-space Ewald cutoff)
    lj_cutoff: float = 9.0            # A
    lj_switch_start: Optional[float] = None  # None => plain truncation
    zero_com_drift: bool = True
    max_init_relaxation_iters: Optional[int] = 200
    recenter_sim_box: bool = False
    snapshot_handlers: SnapshotHandlers = field(default_factory=SnapshotHandlers)
    overrides: MdOverrides = field(default_factory=MdOverrides)
    # --- engine knobs beyond the reference (TPU-specific) ---
    dtype: str = "float32"
    steps_per_chunk: int = 100        # jitted inner-loop length per dispatch
    neighbor_rebuild_every: int = 20  # steps between cell re-binning
    pme_grid: Optional[Tuple[int, int, int]] = None  # None = auto from box
    pme_order: int = 4
    ewald_rtol: float = 1e-5          # erfc(beta*rc) target at the cutoff
    pme_every: int = 1                # reciprocal-space evaluation interval
    cell_capacity_factor: float = 1.7 # padding headroom for cell binning
    # Fused TPU kernel for direct space. Currently opt-in: numerically
    # validated (see tests/test_pallas_kernel.py and the cross-path TPU
    # checks), but the axon remote AOT compiler intermittently miscompiles /
    # faults on programs containing the custom call; the XLA shift-window
    # path is the stable default until that is resolved.
    use_pallas: bool = False
    # "auto" (cluster pair lists when the box allows, else dense window) or
    # "window" to force the dense shift-window backend
    direct_backend: str = "auto"
    # scan-compiled step chunks (one dispatch per chunk — required through
    # high-latency device relays); False = one jitted program per step
    use_scan_chunks: bool = True
    # jax.profiler trace output directory (first-class profiling hook:
    # run() wraps stepping in jax.profiler.trace when set; view with
    # tensorboard or xprof)
    trace_dir: Optional[str] = None
    seed: int = 0

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    # --- persistence (reference MdPrefs persists the whole MdConfig,
    # src/prefs/mod.rs:188; here: plain JSON round-trip) ---
    def to_json(self) -> str:
        import json
        return json.dumps(dataclasses.asdict(self), indent=1)

    @staticmethod
    def from_json(text: str) -> "MdConfig":
        import json
        d = json.loads(text)

        def mk(cls, v):
            return cls(**v) if v is not None else None

        d["integrator"] = mk(Integrator, d.get("integrator"))
        d["barostat_cfg"] = mk(BarostatCfg, d.get("barostat_cfg"))
        d["sim_box"] = mk(SimBoxInit, d.get("sim_box"))
        d["solvent"] = mk(Solvent, d.get("solvent"))
        d["hydrogen_constraint"] = mk(HydrogenConstraint,
                                      d.get("hydrogen_constraint"))
        d["overrides"] = mk(MdOverrides, d.get("overrides"))
        sh = d.get("snapshot_handlers")
        if sh is not None:
            sh["gromacs"] = mk(OutputControl, sh.get("gromacs"))
            d["snapshot_handlers"] = SnapshotHandlers(**sh)
        if d.get("pme_grid") is not None:
            d["pme_grid"] = tuple(d["pme_grid"])
        sb = d.get("sim_box")
        if sb is not None and sb.bounds is not None:
            d["sim_box"] = dataclasses.replace(
                sb, bounds=tuple(tuple(b) for b in sb.bounds))
        return MdConfig(**d)

    def save(self, path) -> str:
        with open(path, "w") as f:
            f.write(self.to_json())
        return str(path)

    @staticmethod
    def load(path) -> "MdConfig":
        with open(path) as f:
            return MdConfig.from_json(f.read())
