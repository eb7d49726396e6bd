"""Scalar / vectorized functions: normalization, text stats, image kernels."""
