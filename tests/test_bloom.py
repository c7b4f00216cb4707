"""Bloom filter / bloom counter tests (reference analogues:
unit_tests/test_mer_dna_bloom_counter.cc, tests/bloom_filter.sh)."""

import numpy as np
import pytest

from jellyfish_tpu.bloom import (
    BloomCounter2,
    BloomFilter,
    opt_k,
    opt_m,
    read_bloom_counter,
    write_bloom_counter,
)


def test_opt_formulas():
    # bloom_common.hpp:61-66
    assert opt_k(0.001) == 10
    assert opt_m(0.001, 100_000) == 1_400_000
    assert opt_k(0.01) == 7


def test_counter_exact_semantics(rng):
    k = 15
    bc = BloomCounter2.from_fpr(0.001, 2000, k, rng=rng)
    keys = np.unique(
        rng.integers(0, 2**30, size=(1500, 1)).astype(np.uint32), axis=0
    )
    singles, doubles = keys[:1000], keys[1000:]
    bc.insert_counts(singles, np.ones(len(singles), dtype=np.uint32))
    bc.insert_counts(doubles, np.full(len(doubles), 5, dtype=np.uint32))
    vs = bc.check(singles)
    vd = bc.check(doubles)
    # no false negatives ever; saturation at 2
    assert (vs >= 1).all()
    assert (vd == 2).all()
    fresh = rng.integers(0, 2**30, size=(3000, 1)).astype(np.uint32)
    assert (bc.check(fresh) >= 1).mean() < 0.05


def test_counter_batch_equals_sequential(rng):
    """min(2, cell+sum) == sequential saturating inserts."""
    k = 9
    base = BloomCounter2.from_fpr(0.01, 500, k, rng=np.random.default_rng(5))
    keys = rng.integers(0, 4**9, size=(300, 1)).astype(np.uint32)
    weights = np.ones(len(keys), dtype=np.uint32)
    batched = BloomCounter2(base.m, base.nb_hashes, k, base.m1, base.m2)
    stepped = BloomCounter2(base.m, base.nb_hashes, k, base.m1, base.m2)
    batched.insert_counts(keys, weights * 3)
    for _ in range(3):
        stepped.insert_counts(keys, weights)
    assert np.array_equal(batched.cells, stepped.cells)


def test_pack_roundtrip(rng):
    from jellyfish_tpu.bloom import _random_hash_pair

    m = 12347  # not a multiple of 5: exercises the partial last byte
    cells = rng.integers(0, 3, size=m).astype(np.uint8)
    bc = BloomCounter2(m, 3, 9, *_random_hash_pair(9, rng), cells=cells)
    packed = bc.packed_bytes()
    assert len(packed) == m // 5 + 1 == bc.nb_bytes()
    assert np.array_equal(BloomCounter2.unpack_bytes(packed, m), cells)


def test_file_roundtrip(tmp_path, rng):
    k = 11
    bc = BloomCounter2.from_fpr(0.01, 1000, k, rng=rng, canonical=True)
    keys = rng.integers(0, 4**11, size=(800, 1)).astype(np.uint32)
    bc.insert_counts(keys, np.ones(800, dtype=np.uint32))
    path = str(tmp_path / "f.bc")
    write_bloom_counter(bc, path)
    bc2 = read_bloom_counter(path)
    assert bc2.m == bc.m and bc2.nb_hashes == bc.nb_hashes
    assert bc2.canonical and bc2.k == k
    assert np.array_equal(bc2.cells, bc.cells)
    assert bc2.m1 == bc.m1 and bc2.m2 == bc.m2
    assert np.array_equal(bc2.check(keys), bc.check(keys))


def test_bloom_filter_presence(rng):
    k = 13
    bf = BloomFilter.from_size(50_000, 0.01, k, rng=rng)
    a = np.unique(rng.integers(0, 4**13, size=(1000, 1)).astype(np.uint32), axis=0)
    first = bf.insert_batch(a)
    assert not first.any() or first.mean() < 0.02  # FPs only
    second = bf.insert_batch(a)
    assert second.all()


def test_device_insert_matches_host_path():
    """Device bloom-counter insert (sort + segment-sum + sorted scatter)
    produces cell-for-cell the same filter as the host sort-unique path
    for the same power-of-two m and matrices."""
    import numpy as np

    from jellyfish_tpu.bloom import BloomCounter2, _random_hash_pair
    from jellyfish_tpu.ops import multiword as mw

    rng = np.random.default_rng(17)
    k = 21
    m1, m2 = _random_hash_pair(k, rng)
    m = 1 << 14
    host = BloomCounter2(m, 4, k, m1, m2, device=False)
    dev = BloomCounter2(m, 4, k, m1, m2, device=True)
    assert dev._device

    W = mw.nwords(2 * k)
    for batch in range(3):
        n = 500 + batch * 100
        mers = rng.integers(0, 1 << 32, size=(n, W), dtype=np.uint32)
        mers[:, -1] &= (1 << 10) - 1  # keep within 2k bits
        weights = rng.integers(0, 4, size=n).astype(np.uint32)
        host.insert_counts(mers, weights)
        dev.insert_counts(mers, weights)
    assert (host.cells == dev.cells).all()
    probe = rng.integers(0, 1 << 32, size=(64, W), dtype=np.uint32)
    probe[:, -1] &= (1 << 10) - 1
    assert (host.check(probe) == dev.check(probe)).all()
