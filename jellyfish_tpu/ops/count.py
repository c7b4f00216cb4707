"""Sort + segment-reduce counting kernels (the CAS-hash-table replacement).

The reference counts by per-mer CAS into a shared open-addressing table
(large_hash_array.hpp:291-295,716-752). TPUs have no line-rate scatter-CAS,
so counting is re-expressed as dataflow:

  1. per batch: lexicographic multi-limb sort of sortkeys (lax.sort on the
     whole batch) + run-length segment reduce -> a deduplicated sorted RUN
     of (sortkey, count) pairs;
  2. runs are merged pairwise (concat + sort + combine-adjacent + compact)
     in an LSM discipline (store.py), amortizing O(log) merges per mer.

Invariants:
  - every run is sorted by sortkey, deduplicated, padded at the tail with
    PAD entries (count == 0). A real entry always has count >= 1; entry
    realness is ALWAYS count != 0 (keys may legitimately be all-ones).
  - counts are 64-bit as (lo, hi) uint32 pairs; batch counts fit in lo.
  - all shapes static; occupancy travels as a device scalar when needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sort_unique", "merge_runs"]


def _sort_ops(vword, keys, payloads):
    """Build lax.sort operand list: validity word, limbs MSW->LSW, payloads."""
    W = keys.shape[-1]
    ops = [vword] + [keys[:, W - 1 - w] for w in range(W)] + list(payloads)
    return ops, W + 1


def sort_unique(keys, weights):
    """Batch of sortkeys -> deduplicated sorted run.

    keys [N, W] uint32, weights [N] uint32 (0 = invalid/masked mer).
    Returns (ukeys [N, W], counts [N] uint32): unique real keys in the dense
    prefix (ascending), PAD (count 0, key all-ones) after.
    """
    N, W = keys.shape
    vword = (weights == 0).astype(jnp.uint32)
    # force invalid keys to the all-ones PAD pattern so garbage never
    # enters the store
    keys = jnp.where((weights == 0)[:, None], jnp.uint32(0xFFFFFFFF), keys)

    ops, num_keys = _sort_ops(vword, keys, [weights])
    sorted_ops = jax.lax.sort(ops, num_keys=num_keys, is_stable=False)
    svword = sorted_ops[0]
    slimbs = sorted_ops[1 : 1 + W]  # MSW..LSW order
    sweights = sorted_ops[1 + W]

    idx = jnp.arange(N, dtype=jnp.int32)
    neq_prev = svword != jnp.roll(svword, 1)
    for l in slimbs:
        neq_prev = neq_prev | (l != jnp.roll(l, 1))
    is_new = neq_prev.at[0].set(True)

    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    csum = jnp.cumsum(sweights.astype(jnp.uint32), dtype=jnp.uint32)
    start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    # count of the segment ending at i = csum[i] - csum[start-1]
    seg_count = csum - jnp.where(start > 0, csum[jnp.maximum(start - 1, 0)], 0)
    is_last = jnp.roll(is_new, -1).at[N - 1].set(True)

    dst = jnp.where(is_last & (svword == 0), seg, N)  # drop pads & non-ends
    counts = jnp.zeros(N, dtype=jnp.uint32).at[dst].set(seg_count, mode="drop")
    ukeys = jnp.full((N, W), 0xFFFFFFFF, dtype=jnp.uint32)
    for w in range(W):
        ukeys = ukeys.at[dst, W - 1 - w].set(slimbs[w], mode="drop")
    ukeys = jnp.where((counts == 0)[:, None], jnp.uint32(0xFFFFFFFF), ukeys)
    return ukeys, counts


def merge_runs(a_keys, a_lo, a_hi, b_keys, b_lo, b_hi):
    """Merge two deduplicated sorted runs into one.

    Returns (keys [Sa+Sb, W], lo, hi, n) with real entries in the dense
    ascending prefix, PADs after; n = number of real entries (device scalar).
    """
    keys = jnp.concatenate([a_keys, b_keys], axis=0)
    lo = jnp.concatenate([a_lo, b_lo], axis=0)
    hi = jnp.concatenate([a_hi, b_hi], axis=0)
    M, W = keys.shape

    vword = ((lo | hi) == 0).astype(jnp.uint32)
    ops, num_keys = _sort_ops(vword, keys, [lo, hi])
    sorted_ops = jax.lax.sort(ops, num_keys=num_keys, is_stable=False)
    svword = sorted_ops[0]
    slimbs = sorted_ops[1 : 1 + W]
    slo = sorted_ops[1 + W]
    shi = sorted_ops[2 + W]

    eq_next = svword == jnp.roll(svword, -1)
    for l in slimbs:
        eq_next = eq_next & (l == jnp.roll(l, -1))
    eq_next = eq_next.at[M - 1].set(False)
    eq_prev = jnp.roll(eq_next, 1).at[0].set(False)

    # each real key occurs in at most 2 entries (inputs are deduplicated):
    # fold entry i+1 into entry i where equal, with 64-bit carry.
    nxt_lo = jnp.roll(slo, -1)
    nxt_hi = jnp.roll(shi, -1)
    add_lo = jnp.where(eq_next, nxt_lo, jnp.uint32(0))
    add_hi = jnp.where(eq_next, nxt_hi, jnp.uint32(0))
    new_lo = slo + add_lo
    carry = (new_lo < slo).astype(jnp.uint32)
    new_hi = shi + add_hi + carry

    real = svword == 0
    keep = real & (~eq_prev)
    n = jnp.sum(keep.astype(jnp.int32))

    dst = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, dst, M)
    out_lo = jnp.zeros(M, dtype=jnp.uint32).at[idx].set(new_lo, mode="drop")
    out_hi = jnp.zeros(M, dtype=jnp.uint32).at[idx].set(new_hi, mode="drop")
    out_keys = jnp.full((M, W), 0xFFFFFFFF, dtype=jnp.uint32)
    for w in range(W):
        out_keys = out_keys.at[idx, W - 1 - w].set(slimbs[w], mode="drop")
    return out_keys, out_lo, out_hi, n
