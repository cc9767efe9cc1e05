"""Compute ops: losses, image metrics, and Pallas TPU kernels."""
