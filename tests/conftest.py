"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set flags before jax initializes (the TPU is reserved for bench runs;
tests exercise the same code on host CPU, including multi-device sharding).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin overrides JAX_PLATFORMS at import; force CPU through
# the config API as well (must happen before any backend is initialized).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(3141592653)


def random_dna(rng, n, with_n=False, n_prob=0.02):
    bases = "ACGTN" if with_n else "ACGT"
    p = None
    if with_n:
        p = [(1 - n_prob) / 4] * 4 + [n_prob]
    return "".join(rng.choice(list(bases), size=n, p=p))


def oracle_counts(seqs, k, canonical):
    """Reference dict-based k-mer counter (the unit-test oracle style the
    reference uses, unit_tests/test_hash_counter.cc:16-80)."""
    from jellyfish_tpu.mer import string_canonicals, string_mers

    counts = {}
    gen = string_canonicals if canonical else string_mers
    for s in seqs:
        for m in gen(s, k):
            counts[m.bits] = counts.get(m.bits, 0) + 1
    return counts
