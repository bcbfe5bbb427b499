"""Compute ops: bonded/nonbonded energies, PBC, cell lists, PME, Pallas kernels."""
