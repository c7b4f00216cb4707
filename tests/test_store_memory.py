"""Store memory must track the DISTINCT count, not total ingested rows
(dedup merges compact + truncate), and stay exact while doing so."""

import numpy as np

from tests.conftest import oracle_counts, random_dna


def test_memory_bounded_by_distinct(rng):
    from jellyfish_tpu.counter import MerCounter

    k = 11
    # a repetitive genome: few distinct mers, many occurrences
    motif = random_dna(rng, 300)
    seqs = [motif] * 64
    c = MerCounter(k, size=1 << 12, rng=np.random.default_rng(3))
    # force frequent consolidations and dedup merges
    c.store.consolidate_rows = 2048
    c.store.branch = 4
    chunk = np.full(512, ord("N"), dtype=np.uint8)
    for s in seqs:
        b = np.frombuffer(s.encode(), dtype=np.uint8)
        ch = chunk.copy()
        ch[: len(b)] = b
        c.add_chunk(ch)
    total_rows_ingested = 64 * (512 - k + 1)
    # after dedup merges+shrink, live bytes must be far below the raw total
    assert c.store.device_bytes() < total_rows_ingested * 8 // 2
    mers, counts = c.finalize()
    expected = oracle_counts(seqs, k, False)
    assert {int(m): int(v) for m, v in zip(mers, counts)} == expected


def test_exactness_across_shrink_cycles(rng):
    from jellyfish_tpu.counter import MerCounter

    k = 13
    seqs = [random_dna(rng, 400, with_n=True) for _ in range(24)]
    c = MerCounter(k, size=1 << 12, rng=np.random.default_rng(4))
    c.store.consolidate_rows = 1024
    c.store.branch = 3
    for s in seqs:
        b = np.frombuffer(s.encode(), dtype=np.uint8)
        ch = np.full(512, ord("N"), dtype=np.uint8)
        ch[: len(b)] = b
        c.add_chunk(ch)
    mers, counts = c.finalize()
    assert {int(m): int(v) for m, v in zip(mers, counts)} == oracle_counts(
        seqs, k, False
    )
