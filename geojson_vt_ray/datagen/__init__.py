"""Deterministic synthetic data (image table, rectangle layers) — no external
data, no wall-clock/randomness; everything is a pure function of row index."""
