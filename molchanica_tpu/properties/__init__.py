"""Science workloads built on the MD engine (reference src/properties/)."""
from .water_sol import WaterSolMdProperties, run_sol_sim  # noqa: F401
