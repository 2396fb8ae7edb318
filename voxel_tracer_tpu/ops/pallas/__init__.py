"""Pallas TPU kernels for the hot traversal paths."""
