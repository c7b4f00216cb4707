"""Rowsort compaction (_compact_sort) must match the global compacting
sort bit-for-bit — including when the density prediction is WRONG and the
on-device overflow fallback fires (correctness must never depend on the
caller's level choice).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from jellyfish_tpu.ops.count import (
    compact_counted,
    compaction_plan,
    merge_many,
)


def _mk_masked(rng, M, W, density, key_bits=None, with_hi=False,
               clustered=False):
    """A deduplicated masked run: `density` fraction of rows real (unique
    keys, count >= 1), the rest PAD (all-ones keys, count 0)."""
    n = int(M * density)
    if clustered:
        # adversarial: all reals in one contiguous block (defeats the
        # hash-spread assumption -> rows overflow -> device fallback)
        real_pos = np.arange(n)
    else:
        real_pos = rng.choice(M, size=n, replace=False)
    keys = np.full((M, W), 0xFFFFFFFF, dtype=np.uint32)
    top_mask = (
        0xFFFFFFFF if key_bits is None
        else (1 << (key_bits - 32 * (W - 1))) - 1
    )
    uniq = rng.choice(M * 4, size=n, replace=False).astype(np.uint64)
    for w in range(W):
        keys[real_pos, w] = (uniq >> np.uint64(0)).astype(np.uint32) + w
    keys[real_pos, W - 1] &= np.uint32(top_mask // 2)  # below PAD
    lo = np.zeros(M, dtype=np.uint32)
    lo[real_pos] = rng.integers(1, 1000, size=n, dtype=np.int64).astype(
        np.uint32
    )
    hi = None
    if with_hi:
        hi = np.zeros(M, dtype=np.uint32)
        hi[real_pos] = rng.integers(0, 3, size=n, dtype=np.int64).astype(
            np.uint32
        )
        lo[real_pos] |= 1  # keep (lo|hi) != 0
    return jnp.asarray(keys), jnp.asarray(lo), (
        None if hi is None else jnp.asarray(hi)
    )


@pytest.mark.parametrize("W,key_bits", [(1, None), (2, 42), (3, 66)])
@pytest.mark.parametrize("density", [0.02, 0.25, 0.4])
@pytest.mark.parametrize("plan", [(512,), (512, 512), (256,), (384, 640)])
def test_rowsort_matches_global(rng, W, key_bits, density, plan):
    M = 1 << 14
    keys, lo, hi = _mk_masked(rng, M, W, density, key_bits)
    ref = compact_counted(keys, lo, hi, key_bits, assume_masked=True)
    got = compact_counted(
        keys, lo, hi, key_bits, assume_masked=True, plan=plan
    )
    for r, g in zip(ref, got):
        if r is None:
            assert g is None
        else:
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_overflow_falls_back_to_global(rng):
    # clustered reals at 60% density: many rows hold > 512 reals, the
    # slicing would drop entries — the device fallback must fire and the
    # result stay exact
    M = 1 << 14
    keys, lo, hi = _mk_masked(rng, M, 2, 0.6, 42, clustered=True)
    ref = compact_counted(keys, lo, hi, 42, assume_masked=True)
    got = compact_counted(keys, lo, hi, 42, assume_masked=True,
                          plan=(512, 512))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_all_ones_real_key_survives_slicing(rng):
    # a genuine all-ones key with count > 0 looks like PAD to a key-based
    # overflow check; the count-based check must keep it
    M = 1 << 13
    keys, lo, hi = _mk_masked(rng, M, 2, 0.1, None)
    keys = keys.at[5].set(jnp.uint32(0xFFFFFFFF))
    lo = lo.at[5].set(jnp.uint32(7))
    ref = compact_counted(keys, lo, None, None, assume_masked=True)
    got = compact_counted(keys, lo, None, None, assume_masked=True,
                          plan=(512,))
    for r, g in zip(ref[:2], got[:2]):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
    k = np.asarray(got[0])
    c = np.asarray(got[1])
    n_real = int((c != 0).sum())
    assert (k[n_real - 1] == 0xFFFFFFFF).all() and c[n_real - 1] == 7


@pytest.mark.parametrize("tail", [1, 777, 1023])
def test_non_multiple_rows_tail_carried(rng, tail):
    M = (1 << 13) + tail
    keys, lo, _ = _mk_masked(rng, M, 2, 0.2, 42)
    ref = compact_counted(keys, lo, None, 42, assume_masked=True)
    got = compact_counted(keys, lo, None, 42, assume_masked=True,
                          plan=(448,))
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_small_runs_skip_slicing(rng):
    # under 4 rows of 1024 the rowsort path must quietly degrade to the
    # global sort (shape guard, no device branch)
    M = 2048
    keys, lo, _ = _mk_masked(rng, M, 2, 0.3, 42)
    ref = compact_counted(keys, lo, None, 42, assume_masked=True)
    got = compact_counted(keys, lo, None, 42, assume_masked=True,
                          plan=(512, 512))
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_merge_many_levels_match(rng):
    # merge_many's compaction sort with levels must be output-identical
    M = 1 << 13
    k1, l1, _ = _mk_masked(rng, M, 2, 0.15, 42)
    k2, l2, _ = _mk_masked(rng, M, 2, 0.15, 42)
    keys = jnp.concatenate([k1, k2])
    lo = jnp.concatenate([l1, l2])
    ref = merge_many(keys, lo, None, max_dups=2, key_bits=42)
    got = merge_many(keys, lo, None, max_dups=2, key_bits=42, plan=(512,))
    for r, g in zip(ref[:3], got[:3]):
        if r is None:
            assert g is None
            continue
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
    assert int(ref[3]) == int(got[3])


def test_compaction_plan_policy():
    # dense runs: no slicing
    assert compaction_plan(1.0) == ()
    assert compaction_plan(0.7) == ()
    # every D is a multiple of 64, above mean + 6 sigma + 16, <= 0.65*C
    for d in (0.02, 0.1, 0.25, 0.4, 0.55):
        plan = compaction_plan(d)
        dd = d
        for D in plan:
            assert D % 64 == 0 and D <= 0.65 * 1024
            mean = 1024 * dd
            sigma = (1024 * dd * (1 - dd)) ** 0.5
            assert D >= mean + 6 * sigma + 16
            dd = dd * 1024 / D
    # low density slices aggressively and recurses
    assert compaction_plan(0.02)[0] <= 128
    assert len(compaction_plan(0.02)) == 2
    assert compaction_plan(0.02, max_levels=1) == (compaction_plan(0.02)[0],)
