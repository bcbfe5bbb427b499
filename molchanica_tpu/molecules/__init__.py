"""Host-side molecule model: atoms, bonds, specs, assembly into Topology."""
