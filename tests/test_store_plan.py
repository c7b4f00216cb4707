"""Speculative rowsort-plan grain compaction (store._grain_plan +
_consolidate_compact_fn plan=): exactness on the planned fast path AND
on the overflow-recovery path (clustered keys defeat the hash-spread
assumption -> the ovf bit must trip and the grain recompute plan-free).
Reference invariant preserved throughout: exact counts + hash-order dump
(sorted_dumper.hpp:57-101)."""

import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.store import SortedCountStore

KEY_BITS = 42
W = 2


def _keys_of_values(vals: np.ndarray) -> jnp.ndarray:
    out = np.empty((len(vals), W), dtype=np.uint32)
    out[:, 0] = vals & 0xFFFFFFFF
    out[:, 1] = vals >> 32
    return jnp.asarray(out)


def _finalize_dict(store: SortedCountStore) -> dict:
    keys, lo, hi, n, pads = store.finalize()
    keys = np.asarray(keys[:n])
    counts = np.asarray(lo[:n]).astype(np.uint64) | (
        np.asarray(hi[:n]).astype(np.uint64) << np.uint64(32)
    )
    vals = keys[:, 0].astype(np.uint64) | (
        keys[:, 1].astype(np.uint64) << np.uint64(32)
    )
    out = {}
    for v, c in zip(vals, counts):
        out[int(v)] = int(c)
    if pads and n and (keys[-1] == np.uint32(0xFFFFFFFF)).all():
        pad_key = int(vals[-1])
        out[pad_key] -= pads
        if out[pad_key] == 0:
            del out[pad_key]
    # ascending hash order must survive every path (unsigned compare:
    # a trailing all-ones PAD entry is legitimately the maximum)
    assert (vals[1:] > vals[:-1]).all()
    return out


def _expected(vals: np.ndarray, npads: int) -> dict:
    out = {}
    for v in vals:
        out[int(v)] = out.get(int(v), 0) + 1
    return out


def _run_store(vals: np.ndarray, npads: int, density_est):
    """Feed one grain-sized raw run (vals + npads PAD rows) through a
    store with the given pre-seeded density estimate."""
    store = SortedCountStore(W, branch=64, consolidate_rows=len(vals) + npads,
                             key_bits=KEY_BITS)
    store.density_est = density_est
    keys = np.asarray(_keys_of_values(vals))
    pads = np.full((npads, W), 0xFFFFFFFF, dtype=np.uint32)
    allk = np.concatenate([keys, pads], axis=0)
    rng = np.random.default_rng(7)
    allk = allk[rng.permutation(len(allk))]
    store.insert_raw(jnp.asarray(allk), jnp.uint32(len(vals)))
    return store


def test_planned_grain_exact_no_overflow(rng):
    # hash-spread keys at ~0.24 density: the seeded estimate yields a
    # one-level plan that must hold (no overflow) and stay exact
    M, npads = 16384, 512
    vals = rng.integers(0, (M - npads) // 4, size=M - npads, dtype=np.uint64)
    store = _run_store(vals, npads, density_est=0.25)
    assert store._grain_plan(M) != ()  # the plan really was active
    got = _finalize_dict(store)
    assert got == _expected(vals, npads)
    assert store.spec_overflows == 0


def test_clustered_overflow_recovers_exact(rng):
    # sequential keys cluster reals ~every other sorted slot (~512/row);
    # a density_est of 0.04 plans D=128 -> every row overflows -> the ovf
    # bit must trip and the plan-free recompute must keep counts exact
    M, npads = 16384, 256
    base = np.arange((M - npads) // 2, dtype=np.uint64)
    vals = np.concatenate([base, base])
    store = _run_store(vals, npads, density_est=0.04)
    plan = store._grain_plan(M)
    assert plan and plan[0] <= 256, plan
    got = _finalize_dict(store)
    assert got == _expected(vals, npads)
    assert store.spec_overflows == 1


def test_pad_trim_exact(rng):
    # grain 1 (30% pads) seeds the model's valid fraction; grain 2 must
    # trim its inert pad tail before the compact and stay exact
    M = 16384
    npads = M * 3 // 10
    store = SortedCountStore(W, branch=64, consolidate_rows=M,
                            key_bits=KEY_BITS)
    store._trim_quantum = 256
    rng2 = np.random.default_rng(11)

    def grain(seed):
        v = np.random.default_rng(seed).integers(
            0, (M - npads) // 4, size=M - npads, dtype=np.uint64
        )
        keys = np.concatenate([
            np.asarray(_keys_of_values(v)),
            np.full((npads, W), 0xFFFFFFFF, dtype=np.uint32),
        ])
        keys = keys[rng2.permutation(M)]
        store.insert_raw(jnp.asarray(keys), jnp.uint32(M - npads))
        return v

    v1 = grain(1)
    v2 = grain(2)
    assert store._pad_trim(M) >= 256  # the trim really engages
    got = _finalize_dict(store)
    exp = _expected(np.concatenate([v1, v2]), 2 * npads)
    assert got == exp
    assert store.spec_overflows == 0


def test_pad_trim_misprediction_recovers(rng):
    # a wildly wrong valid-fraction model (predicts 50% pads, stream has
    # ~1.5%) makes the trim cut into real rows: the bad-trim bit must
    # trip and the trim-free recompute must keep counts exact
    M, npads = 16384, 256
    store = SortedCountStore(W, branch=64, consolidate_rows=M,
                            key_bits=KEY_BITS)
    store._trim_quantum = 256
    store._cov_model = (float(M), 0.5)
    vals = rng.integers(0, M // 4, size=M - npads, dtype=np.uint64)
    keys = np.concatenate([
        np.asarray(_keys_of_values(vals)),
        np.full((npads, W), 0xFFFFFFFF, dtype=np.uint32),
    ])
    keys = keys[np.random.default_rng(12).permutation(M)]
    store.insert_raw(jnp.asarray(keys), jnp.uint32(M - npads))
    got = _finalize_dict(store)
    assert got == _expected(vals, npads)
    assert store.spec_overflows >= 1


def test_coverage_model_seeds_next_grain(rng):
    # two grains: grain 1 runs plan-free (no model), its (n, valid) fit
    # seeds grain 2's plan via the coverage model; outputs stay exact.
    # The universe is M // 4 = 2048 keys at coverage 4, so the fitted G
    # must land near 2048 and the predicted density near distinct/rows.
    M = 8192
    store = SortedCountStore(W, branch=64, consolidate_rows=M,
                            key_bits=KEY_BITS)
    v1 = rng.integers(0, M // 4, size=M, dtype=np.uint64)
    v2 = rng.integers(0, M // 4, size=M, dtype=np.uint64)
    store.insert_raw(_keys_of_values(v1), jnp.uint32(M))
    assert store._grain_plan(M) == ()  # not yet resolved -> unseeded
    store.insert_raw(_keys_of_values(v2), jnp.uint32(M))
    assert store._cov_model is not None
    G, vf = store._cov_model
    assert 1700 < G < 2500 and vf == 1.0
    # the model predicts density AT a given size: a 4x larger grain must
    # predict a LOWER density than a quarter one (coverage saturation)
    d_small = len(store._grain_plan(M // 4))
    d_big = len(store._grain_plan(4 * M))
    assert d_big >= d_small
    got = _finalize_dict(store)
    assert got == _expected(np.concatenate([v1, v2]), 0)
    assert store.spec_overflows == 0


def _dedup_run(vals_counts, cap):
    """Dense-prefix deduplicated run (ascending unique keys + counts,
    PAD rows after) as insert_run expects."""
    vals = np.array(sorted(vals_counts), dtype=np.uint64)
    keys = np.full((cap, W), 0xFFFFFFFF, dtype=np.uint32)
    lo = np.zeros(cap, dtype=np.uint32)
    keys[:len(vals)] = np.asarray(_keys_of_values(vals))
    lo[:len(vals)] = [vals_counts[int(v)] for v in vals]
    return jnp.asarray(keys), jnp.asarray(lo)


def test_planned_level_merge_exact(rng):
    # two deduplicated runs whose merge density matches the seeded
    # coverage model: the level merge takes the masked+planned path and
    # must stay exact with no overflow
    universe = 1500
    counts1 = {v: int(rng.integers(1, 9)) for v in
               rng.choice(universe, size=1400, replace=False)}
    counts2 = {v: int(rng.integers(1, 9)) for v in
               rng.choice(universe, size=1450, replace=False)}
    store = SortedCountStore(W, branch=2, consolidate_rows=1 << 30,
                            key_bits=KEY_BITS)
    store._cov_model = (float(universe), 1.0)
    assert store._final_plan(4096) != ()  # the planned path is active
    store.insert_run(*_dedup_run(counts1, 2048))
    store.insert_run(*_dedup_run(counts2, 2048))
    assert len(store.dedup_levels[1]) == 1  # the merge really happened
    got = _finalize_dict(store)
    exp = {}
    for d in (counts1, counts2):
        for v, c in d.items():
            exp[int(v)] = exp.get(int(v), 0) + c
    assert got == exp
    assert store.spec_overflows == 0


def test_planned_level_merge_overflow_recovers(rng):
    # a wildly underestimated universe (G=64 vs real 1500) plans D=64
    # while rows hold ~375 reals: the merge's ovf bit must trip and the
    # plan-free recompute must keep counts exact
    universe = 1500
    counts1 = {v: 2 for v in range(universe)}
    counts2 = {v: 3 for v in range(0, universe, 2)}
    store = SortedCountStore(W, branch=2, consolidate_rows=1 << 30,
                            key_bits=KEY_BITS)
    store._cov_model = (64.0, 1.0)
    plan = store._final_plan(4096)
    assert plan and plan[0] <= 128, plan
    store.insert_run(*_dedup_run(counts1, 2048))
    store.insert_run(*_dedup_run(counts2, 2048))
    got = _finalize_dict(store)
    exp = {v: 2 + (3 if v % 2 == 0 else 0) for v in range(universe)}
    assert got == exp
    assert store.spec_overflows >= 1


def test_merge_budget_staging_exact(rng):
    # a tiny merge budget forces partial level merges AND staged
    # finalize pre-merges; counts must stay exact throughout
    universe = 700
    store = SortedCountStore(W, branch=3, consolidate_rows=1 << 30,
                            key_bits=KEY_BITS)
    store._merge_bytes_budget = 2048 * (4 * W + 4)  # ~2048-row merges
    exp = {}
    for i in range(9):
        cnts = {v: int(rng.integers(1, 5)) for v in
                rng.choice(universe, size=600, replace=False)}
        for v, c in cnts.items():
            exp[int(v)] = exp.get(int(v), 0) + c
        store.insert_run(*_dedup_run(cnts, 1024))
    got = _finalize_dict(store)
    assert got == exp


def test_preslice_pad_dominated_exact(rng):
    # 70% pads (k near the read length): grain 1 seeds the model, grain
    # 2 must pre-slice half its rows away before the consolidate and
    # stay exact INCLUDING the pad accounting (raw_rows_ever adjusts)
    M = 16384
    nvalid = M * 3 // 10
    store = SortedCountStore(W, branch=64, consolidate_rows=M,
                            key_bits=KEY_BITS)
    rng2 = np.random.default_rng(21)

    def grain(seed):
        v = np.random.default_rng(seed).integers(
            0, 1200, size=nvalid, dtype=np.uint64
        )
        keys = np.concatenate([
            np.asarray(_keys_of_values(v)),
            np.full((M - nvalid, W), 0xFFFFFFFF, dtype=np.uint32),
        ])
        keys = keys[rng2.permutation(M)]
        store.insert_raw(jnp.asarray(keys), jnp.uint32(nvalid))
        return v

    v1 = grain(1)
    assert store._grain_preslice(M) == 0  # cold: no model yet
    v2 = grain(2)
    store._resolve_pending_shrinks()
    assert store._grain_preslice(M) == 512  # model seeded: slicing on
    got = _finalize_dict(store)
    assert got == _expected(np.concatenate([v1, v2]), 2 * (M - nvalid))
    assert store.spec_overflows == 0


def test_preslice_misprediction_recovers(rng):
    # the model claims 30% valid (preslice 512) but the stream is ~97%
    # real: rows hold ~990 reals >> 512, the guard bit must trip and
    # the slice-free recompute must keep counts AND pads exact
    M, npads = 16384, 512
    store = SortedCountStore(W, branch=64, consolidate_rows=M,
                            key_bits=KEY_BITS)
    store._cov_model = (1e9, 0.3)
    assert store._grain_preslice(M) == 512
    vals = rng.integers(0, 1 << 40, size=M - npads, dtype=np.uint64)
    keys = np.concatenate([
        np.asarray(_keys_of_values(vals)),
        np.full((npads, W), 0xFFFFFFFF, dtype=np.uint32),
    ])
    keys = keys[np.random.default_rng(31).permutation(M)]
    store.insert_raw(jnp.asarray(keys), jnp.uint32(M - npads))
    got = _finalize_dict(store)
    assert got == _expected(vals, npads)
    assert store.spec_overflows >= 1


def test_planned_merge_u64_carry(rng):
    # ADVICE r4 high: merge_many's log-scan carries into the hi limb
    # even when every merged run is a 2-tuple; the planned level merge
    # must not discard it — a per-key sum >= 2^32 has to survive both
    # the level merge and finalize exactly (the store's documented
    # 64-bit invariant, binary_dumper.hpp:36-40 saturation happens at
    # WRITE time only)
    big = 3_000_000_000  # fits u32; twice does not
    universe = 1500
    counts1 = {v: int(rng.integers(1, 9)) for v in
               rng.choice(universe, size=1400, replace=False)}
    counts2 = {v: int(rng.integers(1, 9)) for v in
               rng.choice(universe, size=1450, replace=False)}
    counts1[7] = big
    counts2[7] = big
    store = SortedCountStore(W, branch=2, consolidate_rows=1 << 30,
                            key_bits=KEY_BITS)
    store._cov_model = (float(universe), 1.0)
    assert store._final_plan(4096) != ()  # the planned path is active
    store.insert_run(*_dedup_run(counts1, 2048), total=big + 1400)
    store.insert_run(*_dedup_run(counts2, 2048), total=big + 1450)
    assert len(store.dedup_levels[1]) == 1  # the merge really happened
    got = _finalize_dict(store)
    assert got[7] == 2 * big
    exp = {}
    for d in (counts1, counts2):
        for v, c in d.items():
            exp[int(v)] = exp.get(int(v), 0) + c
    assert got == exp
    assert store.spec_overflows == 0


def test_planned_finalize_u64_carry(rng):
    # same carry invariant through finalize's OWN planned K-way path
    # (branch large enough that no level merge happens first)
    big = 3_000_000_000
    counts1 = {3: big, 11: 5}
    counts2 = {3: big, 12: 6}
    store = SortedCountStore(W, branch=64, consolidate_rows=1 << 30,
                            key_bits=KEY_BITS)
    store._cov_model = (16.0, 1.0)
    store.insert_run(*_dedup_run(counts1, 2048), total=big + 5)
    store.insert_run(*_dedup_run(counts2, 2048), total=big + 6)
    assert store._final_plan(4096) != ()
    got = _finalize_dict(store)
    assert got == {3: 2 * big, 11: 5, 12: 6}


def test_grain_u16_escape_counts_exact(rng):
    # production escape case: a pad segment whose count exceeds 0xFFFE
    # (any billion-mer grain) escapes the u16-narrowed compact sort and
    # must be restored exactly — pad accounting included. Model path:
    # grain 1 seeds the coverage model, grain 2 trims its pad tail
    # (spec => u16 counts + escapes)
    M = 1 << 17
    npads = 80000  # pad-segment count > 0xFFFE => escapes
    store = SortedCountStore(W, branch=64, consolidate_rows=M,
                            key_bits=KEY_BITS)
    store._trim_quantum = 1 << 12
    all_vals = []

    def grain(seed):
        vals = np.random.default_rng(seed).integers(
            0, 1 << 40, size=M - npads, dtype=np.uint64
        )
        keys = np.concatenate([
            np.asarray(_keys_of_values(vals)),
            np.full((npads, W), 0xFFFFFFFF, dtype=np.uint32),
        ])
        keys = keys[np.random.default_rng(seed + 1).permutation(M)]
        store.insert_raw(jnp.asarray(keys), jnp.uint32(M - npads))
        all_vals.append(vals)

    grain(3)
    store._resolve_pending_shrinks()
    assert store._pad_trim(M) > 0  # grain 2 really takes the spec path
    grain(5)
    got = _finalize_dict(store)
    assert got == _expected(np.concatenate(all_vals), 2 * npads)
    assert store.spec_overflows == 0


def test_grain_u16_homopolymer_recovers_exact(rng):
    # a key with > 0xFFFE occurrences clusters its masked duplicates in
    # the sorted grain, concentrating real rows elsewhere — the plan's
    # hash-spread assumption breaks, the ovf bit trips, and the
    # retained-input u32 recompute must restore exact counts
    M = 1 << 17
    npads = 3000
    big_n = 80000
    vals = np.concatenate([
        np.repeat(np.uint64(12345), big_n),
        rng.integers(0, 1 << 40, size=M - npads - big_n, dtype=np.uint64),
    ])
    store = SortedCountStore(W, branch=64, consolidate_rows=M,
                            key_bits=KEY_BITS)
    store.density_est = 0.35
    keys = np.concatenate([
        np.asarray(_keys_of_values(vals)),
        np.full((npads, W), 0xFFFFFFFF, dtype=np.uint32),
    ])
    keys = keys[np.random.default_rng(3).permutation(M)]
    store.insert_raw(jnp.asarray(keys), jnp.uint32(M - npads))
    got = _finalize_dict(store)
    assert got[12345] == big_n
    assert got == _expected(vals, npads)
    assert store.spec_overflows >= 1  # the recovery really engaged
