"""System builders: water boxes, solvation packing, benchmark systems."""
