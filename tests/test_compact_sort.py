"""Rowsort compaction (_compact_sort) contract: with a plan it is
SPECULATIVE — the result (dense ascending prefix of real rows) matches the
global compacting sort whenever the returned `ovf` scalar is False, and a
True `ovf` tells the caller the sliced output lost rows and must be
recomputed from the retained input with plan=() (whose ovf is constant
False). The STORE does not use plans (they measured end-to-end neutral —
PERF.md "rowsort plan" note); the ops-level contract remains available
and covered here for callers that batch-compact at known density.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from jellyfish_tpu.ops.count import (
    compact_counted,
    compaction_plan,
)


def _mk_masked(rng, M, W, density, key_bits=None, with_hi=False,
               clustered=False):
    """A deduplicated masked run: `density` fraction of rows real (unique
    keys, count >= 1), the rest PAD (all-ones keys, count 0)."""
    n = int(M * density)
    if clustered:
        # adversarial: all reals in one contiguous block (defeats the
        # hash-spread assumption -> rows overflow -> ovf must report True)
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
    ), n


def _assert_prefix_match(ref, got, n):
    """Speculative outputs are shorter (R*D_last + tail rows); real rows
    must fill the dense ascending prefix [0, n) identically and everything
    past it must be dead (count 0)."""
    rk, rl, rh, _ = ref
    gk, gl, gh, _ = got
    np.testing.assert_array_equal(np.asarray(rk[:n]), np.asarray(gk[:n]))
    np.testing.assert_array_equal(np.asarray(rl[:n]), np.asarray(gl[:n]))
    if rh is None:
        assert gh is None
    else:
        np.testing.assert_array_equal(np.asarray(rh[:n]), np.asarray(gh[:n]))
    g_lo_tail = np.asarray(gl[n:])
    assert (g_lo_tail == 0).all()
    if gh is not None:
        assert (np.asarray(gh[n:]) == 0).all()


# (density, plan) pairs chosen safely under the plan's own 6-sigma
# Binomial model (level i sees density d_i = d_{i-1} * 1024 / D_{i-1})
SAFE_CASES = [
    (0.02, (256,)),
    (0.02, (128, 512)),
    (0.25, (512,)),
    # level 2 sees d = 0.25*1024/384 = 0.667 -> mean 683 + 6*sigma(15) +
    # 16 = 789 -> D2 = 832 (768 was NOT 6-sigma-safe; it only passed while
    # the old divisibility guard silently dropped level 2)
    (0.25, (384, 832)),
    (0.4, (512,)),
]


@pytest.mark.parametrize("W,key_bits", [(1, None), (2, 42), (3, 66)])
@pytest.mark.parametrize("density,plan", SAFE_CASES)
def test_rowsort_matches_global(rng, W, key_bits, density, plan):
    M = 1 << 14
    keys, lo, hi, n = _mk_masked(rng, M, W, density, key_bits)
    ref = compact_counted(keys, lo, hi, key_bits, assume_masked=True)
    assert not bool(ref[3])  # plan=() can never overflow
    got = compact_counted(
        keys, lo, hi, key_bits, assume_masked=True, plan=plan
    )
    assert not bool(got[3]), "hash-spread run must not overflow a safe plan"
    _assert_prefix_match(ref, got, n)


def test_overflow_reported_and_planfree_exact(rng):
    # clustered reals at 60% density: many rows hold > 512 reals, the
    # slicing drops entries — ovf must report True (the sliced result is
    # garbage by contract), and the caller's recompute path (plan=()) must
    # stay exact vs a numpy oracle
    M = 1 << 14
    keys, lo, hi, n = _mk_masked(rng, M, 2, 0.6, 42, with_hi=True,
                                 clustered=True)
    got = compact_counted(keys, lo, hi, 42, assume_masked=True,
                          plan=(512, 512))
    assert bool(got[3]), "clustered overflow must be reported"
    ref = compact_counted(keys, lo, hi, 42, assume_masked=True)
    assert not bool(ref[3])
    # numpy oracle: real rows sorted ascending by (msw, lsw)
    kn = np.asarray(keys)
    ln = np.asarray(lo)
    hn = np.asarray(hi)
    real = (ln | hn) != 0
    order = np.lexsort((kn[real, 0], kn[real, 1]))
    np.testing.assert_array_equal(np.asarray(ref[0][:n]), kn[real][order])
    np.testing.assert_array_equal(np.asarray(ref[1][:n]), ln[real][order])
    np.testing.assert_array_equal(np.asarray(ref[2][:n]), hn[real][order])


def test_no_false_overflow_at_boundary(rng):
    # exactly D reals in every row: the row is full but nothing is lost —
    # ovf must stay False (the check looks at column D, one past the kept
    # slice) and the result must match the global sort
    M = 1 << 13
    C, D = 1024, 512
    R = M // C
    W = 2
    keys = np.full((M, W), 0xFFFFFFFF, dtype=np.uint32)
    lo = np.zeros(M, dtype=np.uint32)
    n = R * D
    uniq = rng.choice(M * 4, size=n, replace=False).astype(np.uint32)
    pos = (np.arange(R)[:, None] * C + np.arange(D)[None, :]).ravel()
    keys[pos, 0] = uniq
    keys[pos, 1] = 0
    lo[pos] = 1 + (uniq % 7)
    keys, lo = jnp.asarray(keys), jnp.asarray(lo)
    ref = compact_counted(keys, lo, None, 42, assume_masked=True)
    got = compact_counted(keys, lo, None, 42, assume_masked=True,
                          plan=(D,))
    assert not bool(got[3])
    _assert_prefix_match(ref, got, n)


def test_all_ones_real_key_survives_slicing(rng):
    # a genuine all-ones key with count > 0 looks like PAD to a key-based
    # overflow check; the count-based check must keep it
    M = 1 << 13
    keys, lo, hi, n = _mk_masked(rng, M, 2, 0.1, None)
    keys = keys.at[5].set(jnp.uint32(0xFFFFFFFF))
    was_pad = bool(np.asarray(lo[5]) == 0)
    lo = lo.at[5].set(jnp.uint32(7))
    n_real = n + 1 if was_pad else n
    ref = compact_counted(keys, lo, None, None, assume_masked=True)
    got = compact_counted(keys, lo, None, None, assume_masked=True,
                          plan=(512,))
    assert not bool(got[3])
    _assert_prefix_match(ref, got, n_real)
    k = np.asarray(got[0])
    c = np.asarray(got[1])
    assert (k[n_real - 1] == 0xFFFFFFFF).all() and c[n_real - 1] == 7


@pytest.mark.parametrize("tail", [1, 777, 1023])
def test_non_multiple_rows_tail_carried(rng, tail):
    M = (1 << 13) + tail
    keys, lo, _, n = _mk_masked(rng, M, 2, 0.2, 42)
    ref = compact_counted(keys, lo, None, 42, assume_masked=True)
    got = compact_counted(keys, lo, None, 42, assume_masked=True,
                          plan=(448,))
    assert not bool(got[3])
    _assert_prefix_match(ref, got, n)


def test_small_runs_skip_slicing(rng):
    # under 4 rows of 1024 the rowsort path must quietly degrade to the
    # global sort (shape guard; ovf is the constant False, full length M)
    M = 2048
    keys, lo, _, n = _mk_masked(rng, M, 2, 0.3, 42)
    ref = compact_counted(keys, lo, None, 42, assume_masked=True)
    got = compact_counted(keys, lo, None, 42, assume_masked=True,
                          plan=(512, 512))
    assert got[0].shape[0] == M
    assert not bool(got[3])
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_compaction_plan_policy():
    # dense runs: no slicing (a level only pays when it drops >= ~15%)
    assert compaction_plan(1.0) == ()
    assert compaction_plan(0.9) == ()
    # every D is a multiple of 64, above mean + 6 sigma + 16, <= 0.85*C
    for d in (0.02, 0.1, 0.25, 0.4, 0.55):
        plan = compaction_plan(d)
        assert plan, f"density {d} should produce at least one level"
        assert len(plan) <= 3  # max_levels default
        dd = d
        for D in plan:
            assert D % 64 == 0 and D <= 0.85 * 1024
            mean = 1024 * dd
            sigma = (1024 * dd * (1 - dd)) ** 0.5
            assert D >= mean + 6 * sigma + 16
            dd = dd * 1024 / D
    # low density slices aggressively and recurses
    assert compaction_plan(0.02)[0] <= 128
    assert len(compaction_plan(0.02)) >= 2
    assert compaction_plan(0.02, max_levels=1) == (compaction_plan(0.02)[0],)
