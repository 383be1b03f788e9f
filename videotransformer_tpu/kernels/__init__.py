"""Pallas TPU kernels for the hot ops (attention families, patch embedding)."""
