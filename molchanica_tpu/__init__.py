"""molchanica-tpu: a TPU-native molecular dynamics / CADD framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
desktop application `David-OConnor/molchanica` (see SURVEY.md at the repo
root): Amber-family MD (bonded + LJ/Coulomb + SPME, OPC water, CSVR/Langevin
thermostats, SETTLE/SHAKE constraints, Berendsen barostat), alchemical free
energy, batched docking scoring, solvation workloads, and the molecule/
force-field front end — designed for TPU hardware (MXU/VPU, HBM locality,
ICI device meshes) rather than translated from the reference's CUDA path.
"""

__version__ = "0.1.0"

from .topology import Topology, make_topology  # noqa: F401
from .md.config import (  # noqa: F401
    BarostatCfg,
    HydrogenConstraint,
    Integrator,
    MdConfig,
    MdOverrides,
    OutputControl,
    SimBoxInit,
    SnapshotHandlers,
    Solvent,
)
from .md.state import MdState, SimBox  # noqa: F401
