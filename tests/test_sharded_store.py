"""Round-4 single-chip store machinery carried to the sharded mesh store
(VERDICT r4 task 1): planned compaction with vmapped ovf recovery,
budget-staged level merges, eighth-pow2 shrink, hi-limb drop, packed
resting runs — all checked for exactness against the host oracle on the
8-device CPU mesh. Reference invariant preserved: exact counts + global
hash order (sorted_dumper.hpp:57-101)."""

import os

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna


def _chunks_from_seqs(seqs, P, L):
    chunks = np.full((P, L), ord("N"), dtype=np.uint8)
    for i, s in enumerate(seqs):
        b = s.encode()
        chunks[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return chunks


def _count(counter, seqs, P, L):
    for i in range(0, len(seqs), P):
        counter.add_chunks(_chunks_from_seqs(seqs[i : i + P], P, L))
    mers, counts = counter.finalize()
    return {int(m): int(c) for m, c in zip(mers, counts)}


def test_sharded_plan_engages_and_matches_noplan(rng, monkeypatch):
    """Functional 8-dev run long enough for >= 2 level-1 merges: the
    first fits the density ratio, later ones must take the PLANNED path
    (plans_engaged > 0); a JF_NO_PLAN=1 A/B run produces identical
    counts with zero plans."""
    import jax

    from jellyfish_tpu.gf2 import GF2Matrix
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    k, lsize = 21, 13
    matrix = GF2Matrix.random_invertible(lsize, 2 * k, rng)
    # 8x-coverage-style stream: reads drawn from a small genome so level
    # merges really deduplicate (plan densities < 1)
    genome = random_dna(np.random.default_rng(5), 4000)
    reads = []
    g = np.random.default_rng(7)
    for _ in range(P * 17):
        off = int(g.integers(0, len(genome) - 200))
        reads.append(genome[off : off + 200])

    def build():
        return ShardedMerCounter(k, size=1 << lsize, mesh=make_mesh(),
                                 canonical=True, matrix=matrix)

    c1 = build()
    got = _count(c1, reads, P, 256)
    assert c1.store.plans_engaged > 0  # the plan really was active
    assert c1.store.spec_overflows == 0

    monkeypatch.setenv("JF_NO_PLAN", "1")
    c2 = build()
    got_np = _count(c2, reads, P, 256)
    assert c2.store.plans_engaged == 0
    assert got == got_np == oracle_counts(reads, k, True)


def test_sharded_skewed_density_ovf_recovers(rng):
    """A wildly wrong density estimate makes the vmapped rowsort plan
    overflow on some shard; the any-reduced ovf bit must trip and the
    plan-free recompute from the retained masked arrays must keep every
    count exact (spec_overflows records the trip, the margin widens)."""
    import jax

    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    k = 21
    counter = ShardedMerCounter(k, size=1 << 13, mesh=make_mesh(),
                                canonical=False, rng=rng)
    # claim 1% density: every row of the rowsort holds far more reals
    # than the plan keeps -> guaranteed overflow on dense random reads
    counter.store.density_est = 0.01
    seqs = [random_dna(rng, 400) for _ in range(P * counter.store.branch)]
    got = _count(counter, seqs, P, 512)
    assert counter.store.spec_overflows >= 1
    assert counter.store._plan_margin > 1.2
    assert got == oracle_counts(seqs, k, False)


def test_sharded_budget_staged_merges(rng):
    """A level merge bigger than the byte budget must stage in
    budget-sized groups instead of one call — and stay exact."""
    import jax

    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    k = 21
    counter = ShardedMerCounter(k, size=1 << 13, mesh=make_mesh(),
                                canonical=False, rng=rng)
    store = counter.store
    # shrink the budget so one merge can hold only ~2 receives' rows:
    # a branch-full level must split into multiple merge calls
    seqs0 = [random_dna(rng, 400) for _ in range(P)]
    counter.add_chunks(_chunks_from_seqs(seqs0, P, 512))
    rows_per_receive = store.levels[1][0][0].shape[1]
    store._merge_bytes_budget = (
        int(2.5 * rows_per_receive) * (4 * store.W + 8)
    )
    merges = []
    orig = store._merge_compact

    def counting_merge(group, rows):
        merges.append((len(group), rows))
        return orig(group, rows)

    store._merge_compact = counting_merge
    seqs = [random_dna(rng, 400) for _ in range(P * (store.branch + 3))]
    got = _count(counter, seqs, P, 512)  # seqs0 already ingested above
    budget_rows = store._merge_rows_budget()
    staged = [m for m in merges if m[0] < store.branch]
    assert staged, "no budget-staged merge happened"
    for n_grp, rows in merges:
        # a take is allowed to exceed the budget only via its minimum
        # 2-run group
        assert n_grp == 2 or rows <= budget_rows
    assert got == oracle_counts(seqs0 + seqs, k, False)


def test_sharded_packed_resting_byte_equal(rng, tmp_path):
    """--packed-store composes with -d: the packed sharded counter dumps
    byte-identically to the dense single-chip dump under a pinned
    matrix, and packed runs really appear in the forest."""
    import jax

    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.gf2 import GF2Matrix
    from jellyfish_tpu.io.dumpers import dump_counter
    from jellyfish_tpu.ops.packed_run import PackedRunBatch
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    k, lsize = 21, 13
    matrix = GF2Matrix.random_invertible(lsize, 2 * k, rng)
    seqs = [random_dna(rng, 600, with_n=True) for _ in range(P * 2)]

    sc = ShardedMerCounter(k, size=1 << lsize, mesh=make_mesh(),
                           canonical=True, matrix=matrix,
                           pack_resting=True)
    for i in range(0, len(seqs), P):
        sc.add_chunks(_chunks_from_seqs(seqs[i : i + P], P, 768))
    db_s = tmp_path / "sharded_packed.jf"
    dump_counter(sc, str(db_s))
    # the finalize resting run is bit-packed
    assert any(isinstance(r, PackedRunBatch)
               for r in sc.store.occupied_runs())

    mc = MerCounter(k, size=1 << lsize, canonical=True, matrix=matrix)
    for s in seqs:
        mc.add_chunk(np.frombuffer(s.encode(), dtype=np.uint8))
    db_1 = tmp_path / "single.jf"
    dump_counter(mc, str(db_1))

    def body(p):
        with open(p, "rb") as f:
            hlen = int(f.read(9))
            f.read(hlen)
            return f.read()

    assert body(db_s) == body(db_1)


def test_sharded_packed_runs_at_levels_exact(rng):
    """pack_resting packs level >= 2 runs mid-stream (not only the
    finalize resting run) and counting stays exact across pack/unpack
    cycles."""
    import jax

    from jellyfish_tpu.ops.packed_run import PackedRunBatch
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    k = 15
    counter = ShardedMerCounter(k, size=1 << 12, mesh=make_mesh(),
                                canonical=False, rng=rng,
                                pack_resting=True)
    counter.store.branch = 2  # cascade quickly to the pack level
    seqs = [random_dna(rng, 300) for _ in range(P * 6)]
    saw_packed = False
    for i in range(0, len(seqs), P):
        counter.add_chunks(_chunks_from_seqs(seqs[i : i + P], P, 384))
        counter.store._resolve_pending()
        saw_packed = saw_packed or any(
            isinstance(r, PackedRunBatch)
            for r in counter.store.occupied_runs()
        )
    mers, counts = counter.finalize()
    got = {int(m): int(c) for m, c in zip(mers, counts)}
    assert saw_packed, "no mid-stream run was ever packed"
    assert got == oracle_counts(seqs, k, False)


def test_sharded_device_filter_no_host_fetch(rng, tmp_path, monkeypatch):
    """VERDICT r4 #5: with a promotable --bc/--bf filter the ingest path
    must stay fully on device — zero per-chunk host fetches (the
    _addressable_rows hook counts them); fetches happen only at
    finalize. Counts must still match the filter semantics."""
    import jax

    import jellyfish_tpu.parallel.sharded as sh
    from jellyfish_tpu.bloom import (
        BloomCounter2,
        load_count_filter,
        write_bloom_counter,
    )
    from jellyfish_tpu.mer import string_canonicals
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P, k = len(jax.devices()), 15
    uniq = [random_dna(rng, 500) for _ in range(P)]
    seqs = uniq + uniq[:3]  # three reads repeat -> their mers count 2

    # build a bc (two-pass) filter over the same reads
    bc = BloomCounter2.from_fpr(0.001, 20000, k,
                                rng=np.random.default_rng(5),
                                canonical=True, device=True)
    # pow2 m (from_fpr device rounding) so the device promotion engages
    assert bc.m & (bc.m - 1) == 0
    from jellyfish_tpu.ops import multiword as mw

    for s in seqs:
        mers = [m.bits for m in string_canonicals(s, k)]
        arr = mw.from_ints(mers, mw.nwords(2 * k))
        bc.insert_counts(arr, np.ones(len(mers), dtype=np.uint32))
    bcf = tmp_path / "f.bc"
    write_bloom_counter(bc, str(bcf))

    fetches = []
    orig = sh._addressable_rows
    monkeypatch.setattr(
        sh, "_addressable_rows",
        lambda arr: fetches.append(1) or orig(arr),
    )

    for mode_kw in (
        dict(bc_path=str(bcf)),
        dict(bf_size=1 << 14, bf_fp=0.001, rng=np.random.default_rng(6)),
    ):
        filt = load_count_filter(k=k, canonical=True, **mode_kw)
        counter = ShardedMerCounter(k, size=1 << 13, mesh=make_mesh(),
                                    canonical=True,
                                    rng=np.random.default_rng(7),
                                    mer_filter=filt)
        assert counter._dev_filter is not None, "promotion did not engage"
        fetches.clear()
        for i in range(0, len(seqs), P):
            counter.add_chunks(_chunks_from_seqs(seqs[i : i + P], P, 640))
            assert not fetches, "ingest fetched device data to host"
        mers, counts = counter.finalize()
        got = {int(m): int(c) for m, c in zip(mers, counts)}
        full = oracle_counts(seqs, k, True)
        if "bc_path" in mode_kw:
            # must equal the HOST filter decision exactly (bloom false
            # positives included — the reference's bc mode admits them)
            hfilt = load_count_filter(k=k, canonical=True, **mode_kw)
            hc = ShardedMerCounter(k, size=1 << 13, mesh=make_mesh(),
                                   canonical=True,
                                   rng=np.random.default_rng(7),
                                   mer_filter=hfilt)
            hc._dev_filter = None  # force the host round-trip path
            for i in range(0, len(seqs), P):
                hc.add_chunks(_chunks_from_seqs(seqs[i : i + P], P, 640))
            hmers, hcounts = hc.finalize()
            hgot = {int(m): int(c) for m, c in zip(hmers, hcounts)}
            assert got == hgot
            assert got  # kept the repeated mers
        else:
            for m, c in got.items():
                assert c > 0 and c in (full[m], full[m] - 1)
            for m, c in full.items():
                if c >= 2:
                    assert got.get(m) in (c, c - 1)
