"""Sort + segment-reduce counting kernels (the CAS-hash-table replacement).

The reference counts by per-mer CAS into a shared open-addressing table
(large_hash_array.hpp:291-295,716-752). TPUs have no line-rate scatter-CAS
(and gathers/scatters measured ~10x an elementwise pass), so counting is
re-expressed as sort-centric dataflow tuned to what the hardware does
well:

  - consolidate_premasked: keys-only lax.sort of a raw backlog + segment
    LENGTHS as counts (the steady-state hot kernel; no payload, no
    cumulative sums, no gathers);
  - merge_many: K-way combine of deduplicated runs; duplicate counts sum
    via a segmented Hillis-Steele log-scan (<= log2(n_runs) shifted adds),
    64-bit exact through explicit unsigned carries; compaction by a second
    keys-only sort with inverted counts as tie-break;
  - merge_raw / sort_unique / merge_runs: weighted variants used by the
    sharded multi-chip path and the scripting API.

Invariants:
  - rows with count 0 contribute nothing (PAD = all-ones keys, count 0);
  - the all-ones segment of raw consolidations carries the pad rows'
    implicit weight; the store corrects it host-side (sortkey bijectivity
    puts at most one real mer there);
  - counts are 64-bit as (lo, hi) uint32 pairs; hi is omitted while a
    store can prove counts fit u32;
  - all shapes static; occupancy travels as a device scalar when needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sort_unique", "merge_runs", "merge_many", "merge_raw",
    "consolidate_premasked", "compact_counted", "compaction_plan",
]


def _sort_runs(keys, invalid, use_vword: bool, payloads):
    """Sort rows by (validity, key) with PADs last.

    When 2k % 32 != 0 the top limb of a real sortkey can never be all-ones,
    so PAD (all-ones) needs no separate validity operand in the sort
    (use_vword=False saves a full sorted pass of traffic)."""
    M, W = keys.shape
    keys = jnp.where(invalid[:, None], jnp.uint32(0xFFFFFFFF), keys)
    limbs = [keys[:, W - 1 - w] for w in range(W)]
    if use_vword:
        vword = invalid.astype(jnp.uint32)
        ops = [vword] + limbs + list(payloads)
        s = jax.lax.sort(ops, num_keys=W + 1, is_stable=False)
        svword = s[0]
        slimbs = s[1 : 1 + W]
        spay = s[1 + W :]
        spad = svword == 1
    else:
        ops = limbs + list(payloads)
        s = jax.lax.sort(ops, num_keys=W, is_stable=False)
        slimbs = s[:W]
        spay = s[W:]
        spad = slimbs[0] == jnp.uint32(0xFFFFFFFF)  # top limb all-ones
    return slimbs, spay, spad


def _segment_marks(slimbs, spad, M):
    neq = spad != jnp.roll(spad, 1)
    for l in slimbs:
        neq = neq | (l != jnp.roll(l, 1))
    is_new = neq.at[0].set(True)
    idx = jnp.arange(M, dtype=jnp.int32)
    start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    is_last = jnp.roll(is_new, -1).at[M - 1].set(True)
    return idx, start, is_last


def _restack(slimbs, M, W):
    return jnp.stack([slimbs[W - 1 - w] for w in range(W)], axis=-1)


def merge_raw(keys, weights, use_vword: bool):
    """Combine concatenated RAW runs: weights in {0,1}, duplicates allowed.

    Counts come from segment LENGTHS (idx - start + 1), so the sort carries
    no count payload and no cumulative sums are needed; output is masked in
    place (sorted keys with zero-count PAD rows interspersed), deferring
    compaction to finalize. Returns (keys [M, W], counts [M]); counts
    < 2^32 by construction (M rows of weight <= 1).
    """
    M, W = keys.shape
    slimbs, _, spad = _sort_runs(keys, weights == 0, use_vword, [])
    idx, start, is_last = _segment_marks(slimbs, spad, M)
    keep = is_last & (~spad)
    counts = jnp.where(keep, (idx - start + 1).astype(jnp.uint32), 0)
    out_keys = jnp.where(
        keep[:, None], _restack(slimbs, M, W), jnp.uint32(0xFFFFFFFF)
    )
    return out_keys, counts


def _narrow_top(limbs, key_bits):
    """Cast the most-significant limb to the smallest dtype that holds its
    used bits (sort traffic is comparator-bound; for k=21 the top limb has
    10 bits -> u16 saves ~20% of key bytes). Safe for PAD rows: all-ones
    truncates to the dtype's all-ones, still above every real key."""
    if key_bits is None:
        return limbs
    top_bits = key_bits - 32 * (len(limbs) - 1)
    # strict inequality: a real top limb must never equal the narrow
    # dtype's all-ones, which _widen_top maps back to the PAD pattern
    if len(limbs) < 2 or top_bits > 15:
        return limbs
    dt = jnp.uint8 if top_bits <= 7 else jnp.uint16
    return [limbs[0].astype(dt)] + limbs[1:]


def _widen_top(slimbs):
    slimbs = list(slimbs)
    if slimbs[0].dtype != jnp.uint32:
        m = jnp.uint32(0xFF if slimbs[0].dtype == jnp.uint8 else 0xFFFF)
        top = slimbs[0].astype(jnp.uint32)
        # restore the canonical all-ones PAD pattern
        top = jnp.where(top == m, jnp.uint32(0xFFFFFFFF), top)
        return [top] + slimbs[1:]
    return slimbs


def consolidate_premasked(keys, key_bits=None, return_n: bool = False):
    """Sort concatenated PREMASKED raw runs and count by segment length.

    keys [M, W]: raw sortkeys with invalid windows already set to the PAD
    pattern (all-ones) by the pipeline — every row carries implicit weight
    1, INCLUDING pads, so the sort needs no validity operand for any k.
    The all-ones segment's count therefore includes the pad rows; the store
    tracks the exact pad total host-side and subtracts it at finalize
    (bijectivity of the sortkey makes all-ones at most one real mer).

    Returns (keys [M, W], counts [M]) masked in place: the count sits on
    the last row of each segment, other rows are PAD with count 0.
    With return_n, appends the segment count (device u32 scalar) — the
    exact number of nonzero-count rows, used by the store's lazy
    occupancy-driven compaction policy.
    """
    M, W = keys.shape
    limbs = _narrow_top(
        [keys[:, W - 1 - w] for w in range(W)], key_bits
    )
    s = _widen_top(jax.lax.sort(limbs, num_keys=W, is_stable=False))
    neq = s[0] != jnp.roll(s[0], 1)
    for l in s[1:]:
        neq = neq | (l != jnp.roll(l, 1))
    is_new = neq.at[0].set(True)
    idx = jnp.arange(M, dtype=jnp.int32)
    start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    is_last = jnp.roll(is_new, -1).at[M - 1].set(True)
    counts = jnp.where(is_last, (idx - start + 1).astype(jnp.uint32), 0)
    out_keys = jnp.where(
        is_last[:, None], _restack(s, M, W), jnp.uint32(0xFFFFFFFF)
    )
    # rows that are not segment-ends become PAD with count 0; the genuine
    # all-ones segment end keeps its (pad-inflated) count for later
    # correction
    if return_n:
        return out_keys, counts, jnp.sum(is_new, dtype=jnp.uint32)
    return out_keys, counts


def _max_of(dtype):
    return jnp.array(np.iinfo(np.dtype(dtype.name)).max, dtype=dtype)


def compaction_plan(density: float, max_levels: int = 3,
                    row_c: int = 1024) -> tuple:
    """Slice-width plan for _compact_sort given (an upper bound on) the
    run's real-row fraction `density`.

    Each level rowsorts [R, row_c] and keeps the first D columns; the plan
    picks the smallest safe D per level. Reals are hash-spread (the store
    only compacts runs of matrix-hashed keys), so reals-per-row ~
    Binomial(row_c, d): D = mean + 6 sigma + 16 keeps the odds of ANY of
    the ~2^17 rows of a full grain overflowing below ~1e-3. Mispredictions
    are harmless — _compact_sort REPORTS overflow as a device scalar and
    the caller recomputes from its retained masked input (correct for ANY
    density, just slower). Level economics (real chip, 2^27 rows,
    experiments/fused_plan_probe.py + experiments/cond_fallback_probe.py):
    a rowsort level costs ~0.66 ms/M of its rows, the final global sort
    ~4.3 ms/M of the survivors — a level pays whenever it drops >= ~15%
    of its rows, hence the D <= 0.85*row_c cutoff."""
    plan = []
    d = max(1e-6, float(density))
    for _ in range(max_levels):
        if d >= 1.0:
            break
        mean = row_c * d
        sigma = (row_c * d * (1.0 - d)) ** 0.5
        D = int(np.ceil((mean + 6.0 * sigma + 16.0) / 64.0)) * 64
        if D > int(0.85 * row_c):
            break
        plan.append(D)
        d = d * row_c / D
    return tuple(plan)


def _compact_sort(limbs, cnt_inv, plan=(), row_c: int = 1024):
    """Sort limbs + inverted-count streams (ALL sort keys) so real rows
    land in the dense ascending prefix — the compaction primitive.

    plan=(): one global lax.sort (the round-2 path, 4.3 ms/M at 2^27).

    plan=(D1, D2, ...): the ROWSORT path (2.3 ms/M at 25% density, real
    chip; experiments/sort_bytes_probe.py, fused_plan_probe.py). Each
    level reshapes to [R, row_c], sorts every row independently (the same
    bytes through ~log2(row_c)^2 comparator stages instead of
    ~log2(M)^2), keeps only the first D_i columns — reals sort to each
    row's prefix, so a row loses entries only if it held more than D_i
    reals — and feeds the sliced stream to the next level; a final global
    sort over the survivors restores total order. The caller picks the
    plan from the run's expected density (compaction_plan).

    SPECULATIVE: the sliced result is returned together with a device
    overflow scalar — there is NO on-device fallback (a lax.cond measures
    speed-neutral, experiments/cond_fallback_probe.py, but holds both
    branches' full-size outputs live, ~2x the in-program peak HBM). A row
    overflow is detected by looking at column D_i of every level (a real
    row there means the row held more reals than the slice keeps; reals
    are recognized by an inverted count limb below the all-ones pattern —
    the key pattern can NOT be used, a genuine all-ones key is real).
    The caller checks `ovf` host-side at a point that already syncs and
    recomputes from its RETAINED masked input on the rare overflow; the
    sliced result is then garbage and must be discarded. Rows past the
    last multiple of row_c bypass the slicing (carried whole into the
    final sort).

    Returns (streams, ovf): sorted streams of length R*D_last + tail
    (<= M; real rows in the dense ascending prefix when ovf is False),
    and the bool overflow scalar (constant False when the plan is
    empty/unusable)."""
    ops = list(limbs) + list(cnt_inv)
    nk = len(ops)
    M = ops[0].shape[0]
    C = row_c
    # keep only the levels still large enough to be worth slicing. No
    # divisibility precondition: each level splits its own sub-row-c tail
    # off (carried whole into the final sort) — real grain sizes are
    # never powers of two, and the old `(rows // C) * D % C == 0` guard
    # silently degraded EVERY production grain to the global sort (the
    # round-4 "plan is end-to-end neutral" mystery).
    usable = []
    rows = M
    for D in plan:
        if not (0 < D < C) or rows < 4 * C:
            break
        usable.append(D)
        rows = (rows // C) * D
    if not usable:
        out = jax.lax.sort(ops, num_keys=nk, is_stable=False)
        return tuple(out), jnp.bool_(False)

    tail_pieces = [[] for _ in ops]
    cur = ops
    ovf = jnp.bool_(False)
    for D in usable:
        n = cur[0].shape[0]
        R = n // C
        body = R * C
        if body < n:
            for pieces, o in zip(tail_pieces, cur):
                pieces.append(o[body:])
        rs = jax.lax.sort(
            [o[:body].reshape(R, C) for o in cur],
            dimension=1, num_keys=nk, is_stable=False,
        )
        pad_at_d = None
        for cs in rs[len(limbs):]:
            p = cs[:, D] == _max_of(cs.dtype)
            pad_at_d = p if pad_at_d is None else (pad_at_d & p)
        ovf = ovf | ~jnp.all(pad_at_d)
        cur = [r[:, :D].reshape(R * D) for r in rs]

    out = jax.lax.sort(
        [jnp.concatenate([c] + pieces)
         for c, pieces in zip(cur, tail_pieces)],
        num_keys=nk, is_stable=False,
    )
    return tuple(out), ovf


def compact_counted(keys, lo, hi=None, key_bits=None, *,
                    assume_masked: bool = False, plan=(), cnt16: bool = False):
    """Compact a DEDUPLICATED counted run.

    keys [M, W], lo/hi [M]: each real key occurs on exactly one row (its
    count on that row); other rows have count 0 (any key). Zero-count rows
    are forced to the PAD pattern, then a compaction sort with BOTH
    inverted count limbs as tie-breaks moves real entries to the dense
    ascending prefix — half the cost of a merge_many(compact=True) pass
    (no payload sort, no log-scan) for runs that are already deduplicated
    but masked in place (consolidation outputs, filtered runs).

    plan: rowsort slice-width plan (see _compact_sort); pick with
    compaction_plan from the run's expected density. SPECULATIVE with a
    non-empty plan: the returned `ovf` device scalar must be checked by
    the caller — when True the output lost rows and the caller recomputes
    from its retained input with plan=() (whose ovf is constant False).

    cnt16 (hi None only): the count tie-break rides as a CLAMPED u16
    (min(count, 0xFFFE)) — 20% less sort traffic at W=2. Ordering is
    unaffected (the tie-break only separates real from count-0 rows
    within equal keys), but the returned lo is CLAMPED: the caller must
    restore any count >= 0xFFFE itself. The store does so with a scalar
    patch of the one structurally-big count (the pad segment's, whose
    entry compacts to prefix position n-1) and folds any other big
    count into its retained-input recovery bit — a general escape side
    sort measured -40% end-to-end and was rejected (PERF.md).

    Returns (keys, lo, hi|None, ovf); output length <= M (rowsort levels
    slice rows away). The caller typically knows n (e.g.
    consolidate_premasked's return_n) and truncates.
    """
    M, W = keys.shape
    if not assume_masked:
        zero = (lo == 0) if hi is None else ((lo | hi) == 0)
        keys = jnp.where(zero[:, None], jnp.uint32(0xFFFFFFFF), keys)
    # assume_masked: caller guarantees zero-count rows already carry the
    # PAD pattern (true for consolidate_premasked outputs) — saves a full
    # elementwise pass over the run
    limbs = _narrow_top([keys[:, W - 1 - w] for w in range(W)], key_bits)
    if hi is None and cnt16:
        c16 = (~jnp.minimum(lo, jnp.uint32(0xFFFE))).astype(jnp.uint16)
        s, ovf = _compact_sort(limbs, [c16], plan)
        Mo = s[0].shape[0]
        out_keys = _restack(_widen_top(list(s[:W])), Mo, W)
        lo16 = (~s[W]).astype(jnp.uint32) & jnp.uint32(0xFFFF)
        return out_keys, lo16, None, ovf
    if hi is None:
        s, ovf = _compact_sort(limbs, [~lo], plan)
        Mo = s[0].shape[0]
        out_keys = _restack(_widen_top(list(s[:W])), Mo, W)
        return out_keys, ~s[W], None, ovf
    s, ovf = _compact_sort(limbs, [~hi, ~lo], plan)
    Mo = s[0].shape[0]
    out_keys = _restack(_widen_top(list(s[:W])), Mo, W)
    return out_keys, ~s[W + 1], ~s[W], ovf


def _wrapped_segment_sums(vals, start):
    """Per-row wrapped (mod 2^32) sum of `vals` over the segment ending at
    that row. Exact whenever the true segment sum is < 2^32 (unsigned
    wrap-around cancels in the difference)."""
    csum = jnp.cumsum(vals.astype(jnp.uint32), dtype=jnp.uint32)
    prev = jnp.where(
        start > 0, csum[jnp.maximum(start - 1, 0)], jnp.uint32(0)
    )
    return csum - prev


def merge_many(keys, lo, hi=None, *, max_dups: int, compact: bool = True,
               key_bits=None):
    """K-way combine of concatenated DEDUPLICATED runs with 64-bit counts.

    keys [M, W], lo [M] uint32, hi [M] uint32 or None (counts known
    < 2^32). Each key occurs at most `max_dups` times (= number of source
    runs — every input run is deduplicated). Rows with count 0 contribute
    nothing (PAD rows are all-ones keys with count 0; zero-count rows with
    real keys — e.g. bloom-filtered — are equally harmless: segments whose
    total is 0 are dropped). No validity sort operand is needed for any k:
    an all-ones segment that mixes PADs with a genuine all-ones key is
    resolved by the store's host-side pad accounting.

    Counts are summed with a segmented Hillis-Steele scan of
    ceil(log2(max_dups)) shifted adds keyed on key-equality at each
    distance — no cumulative sums and no gathers (gathers measured ~10x
    the cost of an elementwise pass on TPU). 64-bit exactness via explicit
    unsigned carries.

    compact=True: returns (keys, lo, hi, n) with real entries in the dense
    ascending prefix (scatter compaction — use for finalize).
    compact=False: returns (keys, lo, hi, None) masked in place (cheaper;
    zero-count rows interspersed — fine as input to further merges).
    """
    M, W = keys.shape
    # counts ride as LEAST-SIGNIFICANT SORT KEYS (hi then lo), not mere
    # payloads: the all-ones PAD key is duplicated by every masked row, so
    # within that segment the <= max_dups NONZERO entries must sort to the
    # segment end for the bounded log-scan to reach them (zero rows sort
    # before them and contribute nothing). Same operand traffic either way.
    payloads = [lo] if hi is None else [hi, lo]
    limbs = _narrow_top([keys[:, W - 1 - w] for w in range(W)], key_bits)
    s = jax.lax.sort(
        limbs + payloads, num_keys=W + len(payloads), is_stable=False
    )
    slimbs = _widen_top(list(s[:W]))
    cur_lo = s[W + len(payloads) - 1]
    cur_hi = s[W] if hi is not None else jnp.zeros_like(cur_lo)
    neq = slimbs[0] != jnp.roll(slimbs[0], 1)
    for l in slimbs[1:]:
        neq = neq | (l != jnp.roll(l, 1))
    is_new = neq.at[0].set(True)
    is_last = jnp.roll(is_new, -1).at[M - 1].set(True)

    idx = jnp.arange(M, dtype=jnp.int32)
    d = 1
    while d < max_dups:
        same = idx >= d
        for l in slimbs:
            same = same & (l == jnp.roll(l, d))
        add_lo = jnp.where(same, jnp.roll(cur_lo, d), jnp.uint32(0))
        add_hi = jnp.where(same, jnp.roll(cur_hi, d), jnp.uint32(0))
        new_lo = cur_lo + add_lo
        carry = (new_lo < add_lo).astype(jnp.uint32)
        cur_lo = new_lo
        cur_hi = cur_hi + add_hi + carry
        d *= 2
    lo_sum, hi_sum = cur_lo, cur_hi

    keep = is_last & ((lo_sum | hi_sum) != 0)
    zero = jnp.uint32(0)
    masked_limbs = [
        jnp.where(keep, l, jnp.uint32(0xFFFFFFFF)) for l in slimbs
    ]
    masked_lo = jnp.where(keep, lo_sum, zero)
    masked_hi = jnp.where(keep, hi_sum, zero)
    if not compact:
        return (_restack(masked_limbs, M, W), masked_lo, masked_hi, None)

    # compaction by a second keys-only sort (scatters measured ~10x the
    # cost of a sort pass on TPU). BOTH bitwise-inverted count limbs ride
    # as least-significant sort keys (hi before lo) so a genuine all-ones
    # entry (count > 0 — including lo == 0 with hi > 0, i.e. an exact
    # multiple of 2^32) orders before pure-PAD rows within the all-ones
    # block.
    n = jnp.sum(keep.astype(jnp.int32))
    s2, _ = _compact_sort(
        _narrow_top(masked_limbs, key_bits), [~masked_hi, ~masked_lo],
    )
    out_keys = _restack(_widen_top(list(s2[:W])), M, W)
    return out_keys, ~s2[W + 1], ~s2[W], n


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
