"""Vectorized TPU kernels: mer extraction, GF(2) hashing, sort-reduce counting."""
