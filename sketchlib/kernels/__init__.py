"""Arrow/numpy sketch kernels (executor-side, no Spark imports here)."""
