"""MD engine: state, config, energy assembly, integrators, constraints, engine."""
