"""Counting pipeline (sortkey, sort_unique, merge_runs, MerCounter, LSM)
against the dict oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from jellyfish_tpu.counter import MerCounter
from jellyfish_tpu.gf2 import GF2Matrix
from jellyfish_tpu.mer import MerDNA
from jellyfish_tpu.ops import multiword as mw
from jellyfish_tpu.ops.count import merge_runs, sort_unique
from jellyfish_tpu.ops.hashing import mers_of_sortkeys, sortkey_of_mers
from tests.conftest import oracle_counts, random_dna


def sortkey_oracle(key, matrix, k, lsize):
    pos = matrix.times(key) & ((1 << lsize) - 1)
    return (pos << (2 * k - lsize)) | (key >> lsize)


@pytest.mark.parametrize("k,lsize", [(5, 7), (21, 20), (33, 30), (64, 40)])
def test_sortkey_bijection(rng, k, lsize):
    m = GF2Matrix.random_invertible(lsize, 2 * k, rng)
    keys = [int(rng.integers(0, 1 << 62)) & ((1 << (2 * k)) - 1) for _ in range(64)]
    W = mw.nwords(2 * k)
    from jellyfish_tpu.ops.hashing import (
        inverse_masks_of_matrix,
        masks_of_matrix,
    )

    arr = jnp.asarray(mw.from_ints(keys, W))
    A = jnp.asarray(masks_of_matrix(m, W))
    sk = sortkey_of_mers(arr, A, k, lsize)
    got = [int(v) for v in mw.to_ints(np.asarray(sk))]
    expect = [sortkey_oracle(key, m, k, lsize) for key in keys]
    assert got == expect
    # invert
    Ainv = jnp.asarray(inverse_masks_of_matrix(m, W))
    back = mers_of_sortkeys(sk, Ainv, k, lsize)
    assert [int(v) for v in mw.to_ints(np.asarray(back))] == keys


def test_sort_unique_basic():
    W = 2
    keys = mw.from_ints([5, 3, 5, 7, 3, 5, 2**40 + 1, 2**40 + 1], W)
    weights = np.array([1, 1, 1, 1, 1, 1, 1, 0], dtype=np.uint32)
    uk, counts = sort_unique(jnp.asarray(keys), jnp.asarray(weights))
    uk = mw.to_ints(np.asarray(uk))
    counts = np.asarray(counts)
    n = int((counts > 0).sum())
    got = {int(uk[i]): int(counts[i]) for i in range(n)}
    assert got == {3: 2, 5: 3, 7: 1, 2**40 + 1: 1}
    # dense ascending prefix
    assert list(uk[:n]) == sorted(got)
    assert all(counts[n:] == 0)


def test_sort_unique_all_invalid():
    W = 1
    keys = mw.from_ints([1, 2, 3], W)
    weights = np.zeros(3, dtype=np.uint32)
    uk, counts = sort_unique(jnp.asarray(keys), jnp.asarray(weights))
    assert int(np.asarray(counts).sum()) == 0


def test_merge_runs_combines():
    W = 1

    def run(pairs, cap):
        ks = [p[0] for p in pairs] + [(1 << 32) - 1] * (cap - len(pairs))
        lo = [p[1] for p in pairs] + [0] * (cap - len(pairs))
        return (
            jnp.asarray(mw.from_ints(ks, W)),
            jnp.asarray(np.array(lo, dtype=np.uint32)),
            jnp.asarray(np.zeros(cap, dtype=np.uint32)),
        )

    a = run([(1, 5), (3, 1), (9, 2)], 4)
    b = run([(3, 7), (8, 1)], 4)
    keys, lo, hi, n = merge_runs(a[0], a[1], a[2], b[0], b[1], b[2])
    n = int(n)
    assert n == 4
    got = {
        int(k): int(v)
        for k, v in zip(mw.to_ints(np.asarray(keys))[:n], np.asarray(lo)[:n])
    }
    assert got == {1: 5, 3: 8, 8: 1, 9: 2}


def test_merge_runs_carry():
    W = 1
    big = (1 << 32) - 2

    def run(lo_val, hi_val):
        return (
            jnp.asarray(mw.from_ints([42, 77], W)),
            jnp.asarray(np.array([lo_val, 1], dtype=np.uint32)),
            jnp.asarray(np.array([hi_val, 0], dtype=np.uint32)),
        )

    a = run(big, 0)
    b = run(5, 0)
    keys, lo, hi, n = merge_runs(*a, *b)
    assert int(n) == 2
    total = int(np.asarray(lo)[0]) + (int(np.asarray(hi)[0]) << 32)
    assert total == big + 5


@pytest.mark.parametrize("k,canonical", [(9, False), (21, True), (33, True), (64, False)])
def test_counter_matches_oracle(rng, k, canonical):
    seqs = [random_dna(rng, 500, with_n=True) for _ in range(6)]
    counter = MerCounter(k, size=1 << 12, canonical=canonical, rng=rng)
    for s in seqs:
        # feed as one read-chunk each (chunk = seq + separator padding)
        chunk = np.frombuffer((s + "N").encode(), dtype=np.uint8)
        counter.add_chunk(chunk)
    mers, counts = counter.finalize()
    got = {int(m): int(c) for m, c in zip(mers, counts)}
    assert got == oracle_counts(seqs, k, canonical)


def test_counter_hash_order(rng):
    k = 11
    seqs = [random_dna(rng, 800)]
    counter = MerCounter(k, size=1 << 10, canonical=False, rng=rng)
    counter.add_chunk(np.frombuffer(seqs[0].encode(), dtype=np.uint8))
    mers, counts = counter.finalize()
    m = counter.matrix
    lsz = counter.lsize
    pos = [m.times(int(x)) & (counter.size - 1) for x in mers]
    order = [(p, int(x)) for p, x in zip(pos, mers)]
    assert order == sorted(order)


def test_counter_identity_small_k(rng):
    """size >= 4^k -> identity matrix, plain key order
    (large_hash_array.hpp:997-1001)."""
    k = 5
    seq = random_dna(rng, 2000)
    counter = MerCounter(k, size=1 << (2 * k), canonical=False)
    assert counter.matrix.is_low_identity()
    counter.add_chunk(np.frombuffer(seq.encode(), dtype=np.uint8))
    mers, counts = counter.finalize()
    assert list(mers) == sorted(int(m) for m in mers)
    assert {int(m): int(c) for m, c in zip(mers, counts)} == oracle_counts(
        [seq], k, False
    )


def test_counter_multibatch_lsm(rng):
    """Many chunks exercise the LSM merge ladder."""
    k = 15
    seqs = [random_dna(rng, 300) for _ in range(17)]
    counter = MerCounter(k, size=1 << 14, canonical=True, rng=rng)
    for s in seqs:
        counter.add_chunk(np.frombuffer((s + "N").encode(), dtype=np.uint8))
    mers, counts = counter.finalize()
    got = {int(m): int(c) for m, c in zip(mers, counts)}
    assert got == oracle_counts(seqs, k, True)
