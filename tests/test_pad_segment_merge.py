"""Regression: merge_many must sum the all-ones (PAD-key) segment exactly
even though that key is duplicated by every masked zero-count row — the
bounded log-scan only reaches the segment tail, so nonzero entries must
sort there (counts as least-significant sort keys).

Pre-fix, a nonzero pad-inflated entry placed EARLY among thousands of
zero PAD rows was silently dropped, which at scale underflowed the store's
pad correction into a ~2^32 count (caught by a 100 Mbase --disk run)."""

import numpy as np
import jax.numpy as jnp

from jellyfish_tpu.ops.count import merge_many


def _run_with_pads(n_pads, inflated_count, real_keys, W=2):
    """A dedup-style run: real entries + one nonzero all-ones entry FIRST
    followed by many all-ones PAD rows (stable sorts would keep it early
    within the segment without the fix)."""
    rows = 1 + n_pads + len(real_keys)
    keys = np.full((rows, W), 0xFFFFFFFF, dtype=np.uint32)
    lo = np.zeros(rows, dtype=np.uint32)
    lo[0] = inflated_count
    for i, (k, c) in enumerate(real_keys):
        keys[1 + n_pads + i, 0] = k
        keys[1 + n_pads + i, 1] = 0
        lo[1 + n_pads + i] = c
    return jnp.asarray(keys), jnp.asarray(lo)


def test_allones_segment_sums_exactly():
    k1, l1 = _run_with_pads(5000, 17, [(5, 2), (9, 3)])
    k2, l2 = _run_with_pads(3000, 25, [(5, 4)])
    keys = jnp.concatenate([k1, k2])
    lo = jnp.concatenate([l1, l2])
    okeys, olo, ohi, n = merge_many(lo=lo, keys=keys, max_dups=2)
    n = int(n)
    got = {}
    ok = np.asarray(okeys)[:n]
    ol = np.asarray(olo)[:n]
    oh = np.asarray(ohi)[:n]
    for i in range(n):
        key = int(ok[i, 0]) | (int(ok[i, 1]) << 32)
        got[key] = int(ol[i]) | (int(oh[i]) << 32)
    all_ones = 0xFFFFFFFFFFFFFFFF
    assert got[all_ones] == 17 + 25  # pad-inflated entries both summed
    assert got[5] == 6 and got[9] == 3
    assert n == 3


def test_allones_segment_with_hi_limbs():
    k1, l1 = _run_with_pads(2000, 7, [(3, 1)])
    h1 = np.zeros(k1.shape[0], dtype=np.uint32)
    h1[0] = 2  # count 7 + 2<<32
    k2, l2 = _run_with_pads(1000, 9, [])
    h2 = np.zeros(k2.shape[0], dtype=np.uint32)
    keys = jnp.concatenate([k1, k2])
    lo = jnp.concatenate([l1, l2])
    hi = jnp.concatenate([jnp.asarray(h1), jnp.asarray(h2)])
    okeys, olo, ohi, n = merge_many(keys, lo, hi, max_dups=2)
    n = int(n)
    ok = np.asarray(okeys)[:n]
    ol, oh = np.asarray(olo)[:n], np.asarray(ohi)[:n]
    vals = {
        int(ok[i, 0]) | (int(ok[i, 1]) << 32):
        int(ol[i]) | (int(oh[i]) << 32)
        for i in range(n)
    }
    assert vals[0xFFFFFFFFFFFFFFFF] == (7 + 9) + (2 << 32)
    assert vals[3] == 1
