"""Vectorized per-batch kernels (numpy / pyarrow.compute) used inside
``map_batches`` stages. Pure functions, no Ray dependency — unit-testable
on plain arrays."""
