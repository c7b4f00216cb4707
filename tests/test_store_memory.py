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


def test_packed_resting_mode_exact(rng):
    """pack_resting=True must be output-identical to the dense store
    across repeated finalizes with inserts in between, and the resting
    copy must be bit-packed (ops/packed_run.py)."""
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.ops.packed_run import PackedRun

    k = 13
    seqs1 = [random_dna(rng, 400, with_n=True) for _ in range(16)]
    seqs2 = [random_dna(rng, 400, with_n=True) for _ in range(8)]

    def feed(c, seqs):
        for s in seqs:
            b = np.frombuffer(s.encode(), dtype=np.uint8)
            ch = np.full(512, ord("N"), dtype=np.uint8)
            ch[: len(b)] = b
            c.add_chunk(ch)

    results = []
    for packed in (False, True):
        c = MerCounter(k, size=1 << 12, rng=np.random.default_rng(9),
                       pack_resting=packed)
        c.store.consolidate_rows = 2048
        c.store.branch = 3
        feed(c, seqs1)
        m1, v1 = c.finalize()
        if packed:
            rest = c.store.dedup_levels[-1]
            assert len(rest) == 1 and isinstance(rest[0], PackedRun)
        feed(c, seqs2)  # resting run participates in the next combine
        m2, v2 = c.finalize()
        results.append(({int(m): int(x) for m, x in zip(m1, v1)},
                        {int(m): int(x) for m, x in zip(m2, v2)}))
    assert results[0] == results[1]
    assert results[0][0] == oracle_counts(seqs1, k, False)
    assert results[0][1] == oracle_counts(seqs1 + seqs2, k, False)


def test_packed_level_runs_shrink_memory(rng):
    """With tiny grain + branch, runs reach _pack_level and must be
    stored packed (device_bytes reflects the ~3x reduction vs dense)."""
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.ops.packed_run import PackedRun

    k = 13
    seqs = [random_dna(rng, 400) for _ in range(48)]
    c = MerCounter(k, size=1 << 12, rng=np.random.default_rng(10),
                   pack_resting=True)
    c.store.consolidate_rows = 1024
    c.store.branch = 2
    for s in seqs:
        b = np.frombuffer(s.encode(), dtype=np.uint8)
        ch = np.full(512, ord("N"), dtype=np.uint8)
        ch[: len(b)] = b
        c.add_chunk(ch)
    c.store._resolve_pending_shrinks()
    packed_runs = [
        r for lvl in c.store.dedup_levels[c.store._pack_level:]
        for r in lvl if isinstance(r, PackedRun)
    ]
    assert packed_runs, "high-level runs should be packed"
    mers, counts = c.finalize()
    assert {int(m): int(v) for m, v in zip(mers, counts)} == oracle_counts(
        seqs, k, False
    )
