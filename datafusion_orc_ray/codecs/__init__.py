"""Pure NumPy/pyarrow codec kernels (no Ray dependency)."""
