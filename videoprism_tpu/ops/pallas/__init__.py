"""Pallas TPU kernels (hot-path implementations behind ``attention_impl`` etc.)."""
