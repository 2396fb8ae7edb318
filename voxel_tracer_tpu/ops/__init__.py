"""Compute ops: ray generation, slab tests, DDA traversal, shading, tonemap,
noise, reprojection, Pallas kernels and the CPU parity oracle."""
