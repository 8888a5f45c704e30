"""Fused Pallas TPU kernels for the codec hot paths."""
