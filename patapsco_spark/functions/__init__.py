"""Vectorized kernels: normalization, tokenization, codecs, hashing."""
