"""Pure geometry kernels (no Ray dependency) shared by the local engine and
the Ray Data pipeline stages."""
