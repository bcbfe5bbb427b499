"""Physical constants and unit system for the molchanica-tpu MD engine.

Unit system (Amber-style "akma"-adjacent, but with time in picoseconds):

  length   : angstrom (A)
  energy   : kcal/mol
  mass     : amu (g/mol)
  charge   : elementary charge (e)
  time     : picosecond (ps)
  velocity : A/ps
  force    : kcal/mol/A
  temperature : kelvin

With these choices acceleration = force / mass * ACCEL_FACTOR where
ACCEL_FACTOR converts (kcal/mol/A)/amu -> A/ps^2.

Reference parity: the reference engine (external `dynamics` crate consumed by
/root/reference/src/md/mod.rs) uses the same Amber-style unit conventions
(dt passed in ps at src/md/mod.rs:748, kcal/mol energies in Snapshot
energy_data at src/md/mod.rs:1241-1245).
"""

# Coulomb constant e^2/(4 pi eps0) in kcal*A/(mol*e^2) (CODATA-derived, the
# value used across the Amber ecosystem).
COULOMB_CONST = 332.0637128

# Boltzmann constant in kcal/(mol*K).
KB = 0.001987204259

# (kcal/mol/A) / amu -> A/ps^2
# 1 kcal/mol = 4184 J/mol; per A = 4.184e13 J/(mol*m); / (1e-3 kg/mol per amu)
# = 4.184e16 m/s^2 = 418.4 A/ps^2.
ACCEL_FACTOR = 418.4

# fs -> ps
FS = 1e-3

# Default Amber 1-4 scaling divisors (parm dat conventions).
SCEE_DEFAULT = 1.2   # electrostatic 1-4 divisor
SCNB_DEFAULT = 2.0   # Lennard-Jones 1-4 divisor

# Pressure: kcal/(mol*A^3) -> bar.
# 1 kcal/(mol*A^3) = 4184 J/mol / (6.02214076e23 /mol) / 1e-30 m^3
#                  = 6.947695e6 J/m^3 = 6.947695e10 Pa = 6.947695e5 bar
PRESSURE_KCAL_PER_A3_TO_BAR = 69476.95457
BAR_TO_KCAL_PER_A3 = 1.0 / PRESSURE_KCAL_PER_A3_TO_BAR

# Defaults mirrored from the reference UI/state (src/state.rs:18-19,
# src/ui/panels/md.rs): thermostat/barostat coupling constants.
TAU_TEMP_DEFAULT = 0.1        # ps, CSVR tau
TAU_PRESSURE_DEFAULT = 1.0    # ps, Berendsen-style barostat tau
PRESSURE_DEFAULT = 1.0        # bar
LANGEVIN_GAMMA_DEFAULT = 1.0  # 1/ps
TEMP_TARGET_DEFAULT = 310.0   # K

# LINCS / SHAKE defaults (src/ui/panels/md.rs:358-370).
LINCS_ORDER_DEFAULT = 4
LINCS_ITER_DEFAULT = 2
SHAKE_TOL_DEFAULT = 1e-6
