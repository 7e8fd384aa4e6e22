"""Ray Data pipeline stages for the tiling + spatial-join engine."""
