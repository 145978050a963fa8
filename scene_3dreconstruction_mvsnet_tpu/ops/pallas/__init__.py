"""Pallas TPU kernels for the MVS hot path."""
