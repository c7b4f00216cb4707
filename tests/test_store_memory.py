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


def test_spec_overflow_recompute_exact(rng):
    """Force the SPECULATIVE rowsort compaction to overflow on every grain
    (a deliberately undersized plan) — the host-side ovf check in
    _resolve_pending_shrinks must recompute from the retained masked input
    and the final counts stay exact (VERDICT r3: a sliced overflow output
    is garbage and must never be merged)."""
    from jellyfish_tpu.counter import MerCounter

    k = 9
    seqs = [random_dna(rng, 400) for _ in range(64)]
    c = MerCounter(k, size=1 << 12, rng=np.random.default_rng(5))
    # the rowsort path needs >= 4 rows of 1024 and slice outputs divisible
    # by 1024: grain 16384 with D=64 satisfies both (16 * 64 = 1024)
    c.store.consolidate_rows = 16384
    c.store.branch = 3
    # every 1024-row band of a grain holds ~hundreds of distinct 9-mers:
    # a 64-wide slice plan MUST overflow
    c.store._plan = lambda: (64,)
    resolved = {"ovf": 0}
    orig = type(c.store)._resolve_pending_shrinks

    def spy(self):
        resolved["ovf"] += sum(
            1 for p in self._pending_shrinks
            if p[4] is not None and bool(p[4])
        )
        orig(self)

    c.store._resolve_pending_shrinks = spy.__get__(c.store)
    for s in seqs:
        b = np.frombuffer(s.encode(), dtype=np.uint8)
        ch = np.full(512, ord("N"), dtype=np.uint8)
        ch[: len(b)] = b
        c.add_chunk(ch)
    mers, counts = c.finalize()
    assert resolved["ovf"] > 0, "plan (64,) must overflow at this density"
    assert {int(m): int(v) for m, v in zip(mers, counts)} == oracle_counts(
        seqs, k, False
    )


def test_spec_runs_resolved_before_merge(rng):
    """A speculative run must never be consumed by a dedup merge before
    its ovf scalar was checked: with branch=2, the second grain triggers a
    level-0 merge while the grains' ovf flags are still pending."""
    from jellyfish_tpu.counter import MerCounter

    k = 9
    seqs = [random_dna(rng, 400) for _ in range(96)]
    c = MerCounter(k, size=1 << 12, rng=np.random.default_rng(6))
    c.store.consolidate_rows = 16384
    c.store.branch = 2
    c.store._plan = lambda: (64,)  # overflows: garbage if merged unchecked
    for s in seqs:
        b = np.frombuffer(s.encode(), dtype=np.uint8)
        ch = np.full(512, ord("N"), dtype=np.uint8)
        ch[: len(b)] = b
        c.add_chunk(ch)
    mers, counts = c.finalize()
    assert {int(m): int(v) for m, v in zip(mers, counts)} == oracle_counts(
        seqs, k, False
    )


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
