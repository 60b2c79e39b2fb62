"""Pallas TPU kernels (fast paths for ops/)."""
