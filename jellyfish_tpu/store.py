"""HBM-resident lazy-consolidation store of (sortkey, count64) runs.

This replaces the reference's lock-free open-addressing table + cooperative
size-doubling (large_hash_array.hpp, hash_counter.hpp:178-238) with a
design driven by measured TPU costs — lax.sort passes dominate, every
dispatch pays fixed latency — so the store does the MINIMUM possible
sorting: ~1 sort pass per ingested mer in steady state.

  - the pipeline appends RAW runs of PREMASKED sortkeys (invalid windows
    already set to the all-ones PAD pattern) — keys only, no payload, no
    per-chunk device work at all;
  - raw rows accumulate to the LARGEST affordable grain
    (`consolidate_rows`, default 2^27; the first grain runs at 1/8 size
    and the grain doubles adaptively for dense universes); ONE jitted
    program then sorts the whole backlog keys-only, counts segments by
    LENGTH (ops/count.consolidate_premasked — the cheapest possible
    combine) and compacts with a single fused count-tiebreak sort
    (compact_counted). Big grain is the cost lever: raw rows carry
    implicit weight 1 (no count operand through the sort), and
    level-merge volume divides by it;
  - a COVERAGE MODEL (universe size G fitted from each grain's distinct
    count) drives three SPECULATIVE slicings, each guarded by a flag bit
    in the grain's packed stats scalar and recovered by a conservative
    recompute from retained inputs at the next resolve sync: the rowsort
    compaction plan (compact_counted plan=), the inert pad-tail trim
    before the compact, and the pad PRESLICE before the consolidate on
    pad-dominated workloads (k close to the read length);
  - sub-grain DRAINS (stream tails) stay masked in place (compaction
    deferred to finalize/a budget trigger) — a masked run is already a
    valid deduplicated merge_many input;
  - compacted runs collect in a branch-8 forest merged with
    ops/count.merge_many (64-bit exact counts, planned compaction when
    the model bounds the merge density), truncated to ~distinct size;
    one merge's input is capped by a memory budget (oversized levels
    merge in budget-sized groups);
  - finalize() K-way combines everything (staged when over budget),
    compacts, and is the reference's dump order (compare
    sorted_dumper.hpp:57-101's mer_heap + token-ring recovery — here
    hash order is the resting state).

PAD accounting: premasked PAD rows carry implicit weight 1 through raw
sorts, inflating the all-ones segment. The store tracks the exact number
of pad rows (a per-chunk device scalar of valid-window counts, summed in
one dispatch at finalize) and subtracts it from the trailing all-ones
entry — the sortkey is a bijection, so at most one REAL mer maps there.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.ops.count import (
    compact_counted,
    compaction_plan,
    consolidate_premasked,
    merge_many,
)
from jellyfish_tpu.ops.packed_run import PackedRun, pack_run, unpack_run

__all__ = ["SortedCountStore"]


@functools.lru_cache(maxsize=64)
def _consolidate_fn(n_runs: int, key_bits):
    """Concat n premasked raw key runs, sort, count segments — MASKED.

    Keys-only sort + segment lengths (~3.2 ms/M measured): the cheapest
    possible combine. The output stays masked in place (sorted keys, each
    real key once with its count, duplicate rows turned into PAD with
    count 0) — used for sub-grain drains (bench/finalize tails), where it
    is a valid deduplicated merge_many input and the compaction pass is
    deferred."""

    @functools.partial(jax.jit, donate_argnums=tuple(range(n_runs)))
    def f(*keys):
        return consolidate_premasked(
            jnp.concatenate(keys, axis=0), key_bits
        )

    return f


@functools.lru_cache(maxsize=64)
def _consolidate_compact_fn(n_runs: int, key_bits, plan=(), trim: int = 0,
                            preslice: int = 0):
    """Fused full-grain combine: consolidate + compact in one program
    (the steady-state grain path).

    Measured device costs (experiments/merge_probe.py, 32M-268M rows):
    keys-only consolidate 3.2 ms/M, compact_counted 4.3 ms/M, but
    merge_many 8.5-10.3 ms/M — so the steady-state path consolidates the
    raw backlog at the LARGEST affordable grain and pays the single
    compacting sort immediately, instead of deferring to a merge_many
    over grain-sized masked runs. Higher levels then only ever merge
    distinct-sized truncated runs.

    plan=() donates the raw inputs and compacts with the global sort.
    A non-empty plan uses the SPECULATIVE rowsort compaction
    (compact_counted plan=; fused 7.24 vs 10.27 ms/M at 2^27 rows /
    0.22 density, W=3, experiments/fused_plan_probe.py) and does NOT
    donate: the caller retains the raw runs and checks the overflow bit
    host-side at its next sync point (_resolve_pending_shrinks),
    recomputing via the plan-free donating path on the rare overflow.

    trim > 0 drops that many rows from the END of the sorted masked run
    before the compact: separator windows premask to the all-ones PAD
    pattern, so after the consolidate sort they sit as an inert
    (count-0) tail — 13% of rows at k=21, 22% at k=33 under 150-base
    reads — except the final row, which carries the pad segment's
    count and is patched onto the new end. Speculative like the plan:
    if the row at the cut is NOT an inert pad (the caller's pad
    estimate overshot), bit 30 of the packed scalar reports it and the
    caller recomputes trim-free from the retained runs.

    preslice in {512, 256} drops pad rows BEFORE the consolidate sort
    for pad-dominated workloads (k=100 on 150-base reads: only 34% of
    windows are valid): rowsort the RAW keys [R, 1024] and keep the
    first `preslice` columns — pads (all-ones, the maximum) sort to
    each row's end, so a row only loses real keys if it held more than
    `preslice`, which the guard detects (the top limb at the cut column
    must be all-ones in every row; real keys can never carry the PAD
    top limb when key_bits % 32 != 0 — the caller gates on that). Only
    the power-of-two keep ratios are offered so the sliced stream stays
    pow2-aligned for the big sort. The caller must subtract the
    statically-known dropped-row count from its pad bookkeeping IF the
    guard stays clean (bit 30 again; the recompute path drops
    nothing).

    Returns (keys, lo, n_packed) with n_packed = n | (ovf << 31) |
    (bad_trim << 30) — one scalar fetch resolves all (n counts the
    distinct segments of a <= 2^28 grain, so it always fits 30 bits)."""
    donate = tuple(range(n_runs)) if not (plan or trim or preslice) else ()

    @functools.partial(jax.jit, donate_argnums=donate)
    def f(*keys):
        raw = jnp.concatenate(keys, axis=0)
        bad = jnp.bool_(False)
        if preslice:
            W = raw.shape[1]
            C = 1024
            R = raw.shape[0] // C
            body = R * C
            rs = jax.lax.sort(
                [raw[:body, W - 1 - w].reshape(R, C) for w in range(W)],
                dimension=1, num_keys=W, is_stable=False,
            )
            bad = ~jnp.all(rs[0][:, preslice] == jnp.uint32(0xFFFFFFFF))
            kept = jnp.stack(
                [rs[W - 1 - w][:, :preslice].reshape(R * preslice)
                 for w in range(W)], axis=-1,
            )
            raw = jnp.concatenate([kept, raw[body:]], axis=0)
        k2, c2, n = consolidate_premasked(
            raw, key_bits, return_n=True
        )
        if trim:
            # sound AND complete: count-0 rows are inert wherever they
            # sit, and any real segment intersecting the cut range has
            # its count-bearing END row inside it (segment rows are
            # contiguous and the range is a suffix minus the patched
            # final row) — so "no nonzero count in the range" exactly
            # characterizes a safe trim
            M = k2.shape[0]
            bad = bad | jnp.any(c2[M - 1 - trim : M - 1] != 0)
            k2 = k2[: M - trim].at[-1].set(k2[M - 1])
            c2 = c2[: M - trim].at[-1].set(c2[M - 1])
        # u16 count tie-break (-20% compact traffic at W=2). The ONE
        # structurally-big count is the pad segment's (>= 0xFFFE at any
        # real scale): it always sits on the LAST masked row (all-ones
        # is the maximum key) and its entry compacts to prefix position
        # n-1, so it is saved as a scalar and patched back — no side
        # sort, no gathers (a full count_escapes side sort measured
        # -40% end-to-end). Any OTHER >= 0xFFFE count (genuine 65k+
        # multiplicity mers — absent from coverage-shaped data) folds
        # into the bad bit and recovers via the retained-input u32
        # recompute. Speculative (retained) paths only: the donating
        # path must stay exact u32.
        spec = bool(plan or trim or preslice)
        if spec:
            M2 = k2.shape[0]
            last_cnt = c2[M2 - 1]
            bad = bad | jnp.any(c2[: M2 - 1] >= jnp.uint32(0xFFFE))
        k3, l3, _, ovf = compact_counted(
            k2, c2, None, key_bits, assume_masked=True, plan=plan,
            cnt16=spec,
        )
        if spec:
            iota = jnp.arange(l3.shape[0], dtype=jnp.uint32)
            l3 = jnp.where(
                (iota == n - 1) & (last_cnt > 0), last_cnt, l3
            )
        n_packed = (
            n
            | (ovf.astype(jnp.uint32) << jnp.uint32(31))
            | (bad.astype(jnp.uint32) << jnp.uint32(30))
        )
        return k3, l3, n_packed

    return f


@functools.lru_cache(maxsize=16)
def _compact_masked_fn(key_bits):
    """Compact one masked counted run (drain leftovers) + its entry
    count."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def f(keys, counts):
        n = jnp.sum((counts != 0).astype(jnp.uint32))
        k2, l2, _, _ = compact_counted(
            keys, counts, None, key_bits, assume_masked=True
        )
        return k2, l2, n

    return f


@functools.lru_cache(maxsize=128)
def _merge_general_fn(arity: tuple, compact: bool, key_bits=None):
    """Concat and combine DEDUPLICATED runs. arity[i]: 2 = (keys, lo),
    3 = (keys, lo, hi). Duplicates per key bounded by len(arity)."""
    n_args = sum(arity)
    any_hi = any(a == 3 for a in arity)

    @functools.partial(jax.jit, donate_argnums=tuple(range(n_args)))
    def f(*args):
        keys, lo, hi = [], [], []
        off = 0
        for a in arity:
            keys.append(args[off])
            rows = args[off].shape[0]
            lo.append(args[off + 1])
            if any_hi:
                hi.append(
                    args[off + 2] if a == 3
                    else jnp.zeros(rows, dtype=jnp.uint32)
                )
            off += a
        k = jnp.concatenate(keys, axis=0)
        l = jnp.concatenate(lo, axis=0)
        h = jnp.concatenate(hi, axis=0) if any_hi else None
        return merge_many(
            k, l, h, max_dups=len(arity), compact=compact, key_bits=key_bits
        )

    return f


@functools.lru_cache(maxsize=64)
def _shrink_fn(cap: int, has_hi: bool):
    n_args = 3 if has_hi else 2

    @functools.partial(jax.jit, donate_argnums=tuple(range(n_args)))
    def f(*args):
        return tuple(x[:cap] for x in args)

    return f


@functools.lru_cache(maxsize=32)
def _final_compact_fn(key_bits, plan, has_hi: bool, donate: bool):
    """Planned compaction of finalize's MASKED K-way merge output.

    The final combine merges ~branch deduplicated runs, so its distinct
    density is ~1/branch — exactly where the rowsort plan shines
    (compact 1.41 vs 4.74 ms/M at 0.125 density, fused_plan_probe).
    finalize() is synchronous (it fetches n right after), so the ovf
    check costs nothing extra: on the rare overflow it recomputes from
    the retained masked arrays with plan=() (donating them then).

    Returns (keys, lo, hi, n_packed) with n_packed = n | (ovf << 31);
    n is computed from the PRE-compact masked counts so it is exact
    even when the sliced result overflowed."""
    dn = ((0, 1, 2) if has_hi else (0, 1)) if donate else ()

    if has_hi:
        @functools.partial(jax.jit, donate_argnums=dn)
        def f(keys, lo, hi):
            n = jnp.sum(((lo | hi) != 0).astype(jnp.uint32))
            k2, l2, h2, ovf = compact_counted(
                keys, lo, hi, key_bits, assume_masked=True, plan=plan
            )
            return (k2, l2, h2,
                    n | (ovf.astype(jnp.uint32) << jnp.uint32(31)))
    else:
        @functools.partial(jax.jit, donate_argnums=dn)
        def f(keys, lo):
            n = jnp.sum((lo != 0).astype(jnp.uint32))
            k2, l2, _, ovf = compact_counted(
                keys, lo, None, key_bits, assume_masked=True, plan=plan
            )
            return (k2, l2, None,
                    n | (ovf.astype(jnp.uint32) << jnp.uint32(31)))

    return f


@functools.lru_cache(maxsize=16)
def _grain_stats_fn(n_valid: int):
    """Stack a grain's packed n|ovf scalar with the sum of its runs'
    valid-row scalars into one [2] u32 vector — a single host fetch at
    resolve time serves the overflow check AND the coverage-model fit
    (valid <= 2^28 so a u32 sum cannot wrap)."""

    @jax.jit
    def f(n_packed, *valids):
        tot = jnp.uint32(0)
        for v in valids:
            tot = tot + v
        return jnp.stack([n_packed, tot])

    return f


@functools.lru_cache(maxsize=16)
def _sum_scalars_fn(n: int):
    """Sum u32 scalars exactly as a (lo, hi) u32 pair (uint64 silently
    truncates to uint32 without jax_enable_x64)."""

    @jax.jit
    def f(*xs):
        lo = jnp.uint32(0)
        hi = jnp.uint32(0)
        for x in xs:
            nl = lo + x
            hi = hi + (nl < x).astype(jnp.uint32)
            lo = nl
        return lo, hi

    return f


def _pow2_groups(runs):
    """Greedily pack runs (in order) into groups whose row totals stay at
    or under a power of two: the sort's internal pow2 padding then costs
    ~nothing. Groups never split a run; a run bigger than the remaining
    target forms its own group. A remainder CLOSE to the next power of
    two (>= 92%) stays one group — padding <= 8% beats log-splitting it
    into [1/2, 1/4, ...] separate sorts (a 134.0M grain backlog must be
    ONE sort, not seven)."""
    groups = []
    remaining = list(runs)
    while remaining:
        total = sum(r.shape[0] for r in remaining)
        ceil = 1 << total.bit_length()
        p = ceil if total >= ceil - (ceil >> 4) - (ceil >> 5) else ceil >> 1
        cur, cur_rows = [], 0
        while remaining and (
            not cur or cur_rows + remaining[0].shape[0] <= p
        ):
            cur_rows += remaining[0].shape[0]
            cur.append(remaining.pop(0))
        groups.append(cur)
    return groups


class SortedCountStore:
    """Lazy-consolidation count store (see module docstring)."""

    def __init__(self, W: int, branch: int = 8,
                 consolidate_rows: int | None = None,
                 key_bits: int | None = None,
                 pack_resting: bool = False):
        # grain: the largest affordable raw backlog (grain*4W bytes HBM;
        # sort throughput is flat through 2^27 rows, merge_probe.py). A
        # bigger grain directly divides the steady-state level-merge
        # volume: runs saturate at the distinct count G, so merge cost per
        # ingested row ~ G/grain
        self.W = W
        self.branch = int(branch)
        self.key_bits = key_bits
        # W=3 fits the 2^27 grain too (w3_grain_probe); the bigger grain
        # both divides level-merge volume AND halves the grain's density,
        # which is what makes the rowsort compaction plan strong
        # (fused 7.24 ms/M at 2^27/0.22 vs 9.29 at 2^26/0.45, W=3)
        if consolidate_rows is None:
            consolidate_rows = (1 << 27) if W <= 3 else (1 << 26)
        self.consolidate_rows = int(consolidate_rows)
        # opt-in HBM-capacity mode (ops/packed_run.py): runs promoted to
        # level >= _pack_level and the finalize resting run are stored
        # BIT-PACKED at ~(2k - p + 7) bits/entry (~30 at k=21 vs 96
        # dense — the reference's Offsets trick transposed to a dense
        # sorted array, doc/jellyfish.tex:128-134) and lazily unpacked
        # when a merge consumes them
        self.pack_resting = bool(pack_resting)
        self._pack_level = 2
        # cap on accumulated sub-grain masked drain leftovers before they
        # are compacted into the dedup forest
        self.masked_rows_budget = 192 << 20
        # cap on one merge's INPUT bytes (see _merge_rows_budget)
        self._merge_bytes_budget = 2_400_000_000
        self.raw: list = []          # [(keys [M, W],)] premasked
        self.raw_rows = 0
        # masked sub-grain drain outputs: [(keys, counts)] — sorted,
        # deduplicated-with-counts, PAD rows interspersed (not truncatable)
        self.masked0: list = []
        self.valid_scalars: list = []  # device scalars: valid rows per raw run
        self.raw_rows_ever = 0         # host int: all raw rows ever inserted
        self.total_weight = 0          # host upper bound on any single count
        # dedup runs by generation: level i holds runs produced by i
        # merges; merging only within a level keeps total sorted work at
        # O(log_R) passes per element (no re-sorting of big runs every
        # cycle)
        self.dedup_levels: list[list] = [[] for _ in range(16)]
        self._pending_shrinks: list = []
        self.total_inserted = 0
        # pads already baked into the stored all-ones entry by a previous
        # finalize (the device entry stays inflated; the correction is
        # host-side), carried so repeated finalizes stay exact
        self.residual_pads = 0
        # Coverage model fitted from the most recent grain consolidation:
        # (G, valid_frac) where G is the effective distinct-key universe
        # ("genome size") solved from n = G * (1 - e^(-R_valid / G)).
        # Density is NOT a constant — it falls with grain size as
        # coverage saturates — so the model predicts the density of a
        # compaction at ITSOWN row count (a quarter-size warmup grain
        # would otherwise over-seed the full grains by ~2x). None =
        # unknown -> plan-free global sort. A misprediction trips the
        # ovf bit and costs one plan-free recompute, never correctness.
        self._cov_model: tuple[float, float] | None = None
        # manual density override (tests / callers with exact knowledge):
        # when set, used verbatim for every compaction size
        self.density_est: float | None = None
        self._cold = True  # no grain compaction dispatched yet
        self._raw_valid: list = []  # per-run valid scalars of the backlog
        # diagnostic: planned grain compactions that tripped the rowsort
        # overflow bit and recomputed plan-free (should stay ~0 on hash-
        # spread keys; nonzero signals a misestimated density)
        self.spec_overflows = 0
        self._plan_margin = 1.2
        # pad-trim shape quantum (smaller in tests to reach the path)
        self._trim_quantum = 1 << 20

    # -- ingestion ------------------------------------------------------------

    def insert_raw(self, keys, n_valid_scalar) -> None:
        """Append a premasked raw run; n_valid_scalar is the device scalar
        count of non-PAD rows (for the all-ones correction)."""
        # opportunistic resolve: when every pending stats scalar is
        # already computed (its producing program finished), resolving
        # now is stall-free — and it frees speculative grains' RETAINED
        # raw runs a whole grain-period earlier than the next boundary
        # sync (the peak-HBM lever that lets 2^28 grains fit)
        if self._pending_shrinks and all(
            getattr(p[2], "is_ready", lambda: False)()
            for p in self._pending_shrinks
        ):
            self._resolve_pending_shrinks()
        self.raw.append(keys)
        self.raw_rows += keys.shape[0]
        self.raw_rows_ever += keys.shape[0]
        self.total_weight += keys.shape[0]
        self.valid_scalars.append(n_valid_scalar)
        self._raw_valid.append(n_valid_scalar)
        self.total_inserted += 1
        # greedy pow2-aligned trigger: XLA's sort pads to the next power of
        # two internally (measured ~35% per-row penalty just above one), so
        # consolidate BEFORE another same-sized run would cross the grain —
        # the backlog lands just under the pow2 instead of just over
        grain = self._effective_grain()
        if (self.raw_rows >= grain
                or self.raw_rows + keys.shape[0] > grain):
            self._consolidate(compact=True)

    def _effective_grain(self) -> int:
        """The FIRST grain runs at 1/8 size: its compaction is
        necessarily plan-free (no coverage model yet — the one expensive
        global compacting sort), and a smaller cold grain both costs
        less per row and seeds the rowsort plan for the full-size grains
        8x sooner. Steady-state cost is unchanged (one extra level-0
        run).

        After the model exists, the grain DOUBLES (W <= 2, one doubling
        — HBM-bounded) while the predicted in-grain density stays above
        0.45: a large distinct universe (e.g. a 134M-base genome at 8x
        coverage) makes small grains dense, where the compaction plan is
        weak AND level-merge volume per mer is highest (see PERF.md's
        long-stream scale curve)."""
        if self._cold and self.density_est is None:
            return max(self.consolidate_rows >> 3, 1024)
        grain = self.consolidate_rows
        if self.density_est is None and self._cov_model is not None:
            max_grain = (
                2 * self.consolidate_rows if self.W <= 2
                else self.consolidate_rows
            )
            while grain < max_grain and self._predict_density(grain) > 0.45:
                grain *= 2
        return grain

    def _predict_density(self, rows: int) -> float:
        """Coverage-model distinct/rows prediction for a compaction of
        `rows` raw rows (1.0 when no model)."""
        if self._cov_model is None:
            return 1.0
        G, vf = self._cov_model
        r_real = max(rows * vf, 1.0)
        return (G * (1.0 - float(np.exp(-r_real / G))) + 1.0) / rows

    def insert_run(self, keys, lo, hi=None, total: int | None = None) -> None:
        """Insert a deduplicated (or filtered) run; hi None when counts are
        known < 2^32."""
        # this path (filter modes) never consolidates, so resolve here to
        # keep merge outputs truncated (memory bound, commit c09a28c)
        self._resolve_pending_shrinks()
        self.dedup_levels[0].append((keys, lo, hi))
        self.total_weight += int(
            total if total is not None else keys.shape[0]
        )
        self.total_inserted += 1
        self._maybe_merge_dedup()

    def _consolidate(self, compact: bool | None = None) -> None:
        """Combine the raw backlog.

        compact=None (default): pay the compacting sort when the backlog
        reached the full grain (the steady-state insert path), and leave
        sub-grain drains MASKED (deferred compaction — drains happen at
        stream tails where the combine cost lands in the Writing phase).
        """
        # resolve at consolidation boundaries only: the int(n) fetch syncs
        # the host on the previous consolidate/merge chain, so doing it at
        # every insert would stall pipeline dispatch (memory stays bounded
        # by at most one unshrunk run per level)
        self._resolve_pending_shrinks()
        if not self.raw:
            return
        if compact is None:
            compact = self.raw_rows >= self._effective_grain()
        runs, self.raw, self.raw_rows = self.raw, [], 0
        valids, self._raw_valid = self._raw_valid, []
        if compact:
            self._cold = False
            # pow2 groups: the grain trigger lands the backlog just under
            # a power of two (one group); a FORCED compaction of an
            # arbitrary-sized tail splits like the drain path so the
            # sort's internal pow2 padding stays cheap
            off = 0
            for g in _pow2_groups(runs):
                vg, off = valids[off:off + len(g)], off + len(g)
                rows = sum(r.shape[0] for r in g)
                preslice = self._grain_preslice(rows)
                dropped = 0
                if preslice:
                    body = (rows // 1024) * 1024
                    dropped = body - (body // 1024) * preslice
                trim = self._pad_trim(rows, dropped)
                plan = self._grain_plan(rows, rows - dropped - trim)
                k2, l2, n = _consolidate_compact_fn(
                    len(g), self.key_bits, plan, trim, preslice
                )(*g)
                # one [2] device vector = (n | flags, valid rows): a
                # single host fetch at resolve drives the overflow/trim
                # checks and the coverage-model fit
                stats = _grain_stats_fn(len(vg))(n, *vg)
                run = (k2, l2, None)
                self.dedup_levels[0].append(run)
                # plan/trim/preslice => speculative: retain the raw runs
                # so the resolve can recompute conservatively on the
                # rare rowsort overflow / slicing misprediction
                spec = bool(plan or trim or preslice)
                self._pending_shrinks.append(
                    (0, run, stats, rows,
                     list(g) if spec else None, dropped)
                )
        else:
            # pow2-aligned grouping: XLA's sort pads to the next power of
            # two, so one 100M-row drain sort costs like 134M; splitting
            # into [<=2^26][<=2^25] groups sorts only what's there
            for g in _pow2_groups(runs):
                k2, c2 = _consolidate_fn(len(g), self.key_bits)(*g)
                self.masked0.append((k2, c2))
            self._maybe_compact_masked()
        self._maybe_merge_dedup()

    def _maybe_compact_masked(self) -> None:
        """Fold accumulated masked drain leftovers into the dedup forest
        once they exceed the branch count or the rows budget (bounds their
        HBM at masked_rows_budget × (W+1) × 4 bytes)."""
        if not self.masked0:
            return
        rows = sum(r[0].shape[0] for r in self.masked0)
        if len(self.masked0) < self.branch and rows < self.masked_rows_budget:
            return
        pend, self.masked0 = self.masked0, []
        for keys, counts in pend:
            rows = keys.shape[0]
            k2, l2, n = _compact_masked_fn(self.key_bits)(keys, counts)
            run = (k2, l2, None)
            self.dedup_levels[0].append(run)
            self._pending_shrinks.append((0, run, n, rows, None, 0))

    def _merge_rows_budget(self) -> int:
        """Max input rows for one merge_many call. The merge holds ~4-5x
        its input bytes live (sort operands + sorted copy + masked +
        compact); merge_probe measured OOM at 268M W=2 rows on the 16GB
        chip. Oversized merges split into budget-sized stages instead of
        dying — a billion-distinct-mer stream must not OOM at its first
        branch^2 level merge."""
        per_row = 4 * self.W + 4
        return max(2048, self._merge_bytes_budget // per_row)

    @staticmethod
    def _run_rows(r) -> int:
        return r.n if isinstance(r, PackedRun) else r[0].shape[0]

    def _materialize(self, run):
        """Dense (keys, lo, hi) view of a run; unpacks PackedRun lazily."""
        if isinstance(run, PackedRun):
            k, l, h = unpack_run(run)
            return (k, l, h)
        return run

    def _maybe_pack(self, lvl: int, run, n: int):
        """Pack a freshly shrunk run when the capacity mode is on and the
        run sits high enough in the forest (rarely touched again)."""
        if not (self.pack_resting and lvl >= self._pack_level
                and self.key_bits is not None and n > 0):
            return run
        k, l, h = run
        return pack_run(k, l, h, n, self.key_bits)

    def _maybe_merge_dedup(self) -> None:
        lvl = 0
        while len(self.dedup_levels[lvl]) >= self.branch:
            # a merge must never consume an unresolved SPECULATIVE run
            # (its rowsort overflow bit is still unchecked — the data may
            # be garbage): resolve first. Costs one early host sync per
            # branch grains at most.
            if any(
                p[4] is not None
                and any(p[1] is r for r in self.dedup_levels[lvl])
                for p in self._pending_shrinks
            ):
                self._resolve_pending_shrinks()
            # take a budget-bounded PREFIX of the level (normally all of
            # it); the while loop keeps merging the remainder in further
            # budget-sized groups until the level is below branch
            level = self.dedup_levels[lvl]
            budget = self._merge_rows_budget()
            take, rows = [], 0
            for r in level:
                rr = self._run_rows(r)
                if len(take) >= 2 and rows + rr > budget:
                    break
                take.append(r)
                rows += rr
            self.dedup_levels[lvl] = level[len(take):]
            group = [self._materialize(r) for r in take]
            arity = tuple(2 if r[2] is None else 3 for r in group)
            args = [x for r in group for x in (r[:2] if r[2] is None else r)]
            # dedup merges COMPACT so device memory tracks the distinct
            # count, not total ingested rows; the run is then truncated to
            # a power-of-2 capacity (host fetch of n — once per branch^lvl
            # consolidations, negligible)
            # the planned path RETAINS the masked merge (+16B/row live
            # until resolve): only plan when the merge is inside budget
            plan = self._final_plan(rows) if rows <= budget else ()
            retained = None
            if plan:
                # masked merge + planned compact (the merge's density is
                # bounded by (G+1)/rows — the plan's sweet spot); the
                # masked arrays are retained for the plan-free recompute
                # if the overflow bit comes back set at resolve time.
                # has_hi must ALSO trip on total_weight: merge_many's
                # log-scan carries into the hi limb even when every input
                # is a 2-tuple (grain outputs always are), and dropping
                # that limb would wrap counts >= 2^32 mod 2^32
                has_hi = (any(a == 3 for a in arity)
                          or self.total_weight >= (1 << 32))
                mk, ml, mh, _ = _merge_general_fn(
                    arity, False, self.key_bits
                )(*args)
                margs = (mk, ml, mh) if has_hi else (mk, ml)
                k2, l2, h2, n = _final_compact_fn(
                    self.key_bits, plan, has_hi, False
                )(*margs)
                retained = ("merge", has_hi, margs)
            else:
                k2, l2, h2, n = _merge_general_fn(
                    arity, True, self.key_bits
                )(*args)
            if h2 is not None and self.total_weight < (1 << 32):
                h2 = None  # counts provably fit u32: drop the limb
            if lvl + 1 >= len(self.dedup_levels):
                raise RuntimeError("store exceeded maximum level count")
            run = (k2, l2, h2)
            self.dedup_levels[lvl + 1].append(run)
            # defer the truncation: fetching n here would stall the host on
            # the whole merge; resolve at the next insert/finalize, by when
            # the merge has overlapped with subsequent pipeline work
            self._pending_shrinks.append(
                (lvl + 1, run, n, None, retained, 0)
            )
            # a budget-limited partial take can leave this level >= branch:
            # keep merging here before moving up
            if len(self.dedup_levels[lvl]) < self.branch:
                lvl += 1

    def _grain_plan(self, rows: int, compact_rows: int | None = None) -> tuple:
        """Rowsort slice plan for the compaction of a grain of `rows`
        RAW rows whose compact input holds `compact_rows` rows (fewer
        when a preslice/trim removed pads — the same distinct keys in a
        shorter array is a proportionally DENSER compact).

        Density comes from the fitted coverage model evaluated AT THIS
        row count (distinct saturates with coverage, so a 134M-row grain
        is ~2x denser in pads than a 34M warmup — a flat estimate would
        mis-plan one of them). density_est overrides when a caller/test
        knows better; JF_NO_PLAN=1 disables planning (A/B runs)."""
        if os.environ.get("JF_NO_PLAN"):
            return ()
        if self.density_est is not None:
            d = self.density_est
        elif self._cov_model is not None:
            d = self._predict_density(rows)
            if compact_rows and compact_rows < rows:
                d = min(1.0, d * rows / compact_rows)
        else:
            return ()
        # headroom on top of the plan's own 6-sigma + 16 margin: the
        # coverage model fit measured < 2% off on real grains, and a
        # misprediction costs one plan-free recompute, never correctness.
        # The margin self-widens after each overflow (skewed/tiny streams
        # where the model's marginal fit underestimates density) so a
        # persistent mis-fit cannot keep halving throughput.
        return compaction_plan(min(1.0, self._plan_margin * d))

    def _final_plan(self, rows: int) -> tuple:
        """Rowsort plan for finalize's K-way merge compaction. The
        distinct union is bounded by the coverage model's universe G
        (whatever the number of merged runs), so density <= (G+1)/rows
        — at branch-many saturated runs that is ~1/branch, the plan's
        sweet spot. Model-only on purpose: density_est describes RAW
        grain density, not merge density."""
        if os.environ.get("JF_NO_PLAN") or self._cov_model is None:
            return ()
        G, _ = self._cov_model
        d = min(1.0, (G + 1.0) / max(rows, 1))
        return compaction_plan(min(1.0, self._plan_margin * d))

    def _pad_trim(self, rows: int, dropped: int = 0) -> int:
        """Rows of inert PAD tail to slice off before a grain's compact
        (85% of the modeled pad count LEFT after any preslice already
        dropped `dropped` pads, floor-quantized to 2^20 rows to bound
        the set of compiled shapes; 0 when unknown/too small)."""
        if self.density_est is not None or self._cov_model is None:
            return 0
        _, vf = self._cov_model
        q = self._trim_quantum
        pads_left = rows * (1.0 - vf) - dropped
        trim = (int(max(pads_left, 0.0) * 0.85) // q) * q
        return trim if trim >= q else 0

    def _grain_preslice(self, rows: int) -> int:
        """Pre-consolidate pad slicing width (512, 256 or 0 = off). Only
        pays on pad-DOMINATED workloads (k close to the read length, or
        N-heavy input): the kept fraction must cover the real rows per
        1024-row window at 6 sigma, and only power-of-two keep ratios
        preserve the big sort's pow2 alignment. Needs key_bits % 32 !=
        0 (the guard relies on real keys never carrying the PAD top
        limb) and enough rows to slice."""
        if (self.density_est is not None or self._cov_model is None
                or self.key_bits is None or self.key_bits % 32 == 0
                or rows < 4096):
            return 0
        _, vf = self._cov_model
        mean = 1024.0 * vf
        need = mean + 6.0 * (1024.0 * vf * (1.0 - vf)) ** 0.5 + 16.0
        if need <= 256.0:
            return 256
        if need <= 512.0:
            return 512
        return 0

    def _fit_cov_model(self, n: int, valid: int, rows: int) -> None:
        """Fit (G, valid_frac) from one grain: n distinct segments out of
        `valid` real rows — solve n = G*(1-e^(-valid/G)) by bisection on
        the coverage c = valid/G ((1-e^-c)/c is monotone decreasing)."""
        pads = rows - valid
        n_real = max(n - (1 if pads > 0 else 0), 1)  # drop the pad segment
        r_real = max(valid, 1)
        ratio = min(n_real / r_real, 0.999999)
        lo_c, hi_c = 1e-9, 80.0
        for _ in range(60):
            mid = 0.5 * (lo_c + hi_c)
            if (1.0 - float(np.exp(-mid))) / mid > ratio:
                lo_c = mid
            else:
                hi_c = mid
        c = 0.5 * (lo_c + hi_c)
        self._cov_model = (r_real / c, valid / rows)

    def _note_overflow(self) -> None:
        """A speculative slicing mispredicted: count it and widen the
        planning margin so a persistently mis-fit stream converges to
        plan-free behavior instead of recomputing every grain."""
        self.spec_overflows += 1
        self._plan_margin = min(self._plan_margin * 1.25, 2.5)

    def _replace_run(self, lvl: int, run, new_run):
        """Swap a level's run in place (identity match); returns
        new_run either way — a consumed run just skips the shrink."""
        level = self.dedup_levels[lvl]
        for j, r in enumerate(level):
            if r is run:
                level[j] = new_run
                break
        return new_run

    def _resolve_pending_shrinks(self) -> None:
        pending, self._pending_shrinks = self._pending_shrinks, []
        for lvl, run, n_dev, src_rows, retained, dropped in pending:
            arr = np.asarray(n_dev)
            if arr.ndim:  # grain entry: [2] = (n | flags, valid rows)
                n, valid = int(arr[0]), int(arr[1])
                # bit 31 of the packed scalar is the rowsort overflow
                # flag, bit 30 the trim/preslice misprediction flag;
                # either way the sliced result is garbage and the grain
                # recomputes slice-free from the retained raw runs
                # (donating them this time)
                ovf, n = bool(n >> 30), n & 0x3FFFFFFF
                if ovf:
                    self._note_overflow()
                    k2, l2, n2 = _consolidate_compact_fn(
                        len(retained), self.key_bits
                    )(*retained)
                    run = self._replace_run(lvl, run, (k2, l2, None))
                    n = int(n2)
                elif dropped:
                    # clean preslice: the statically-dropped rows were
                    # verified pads that never reached the consolidate —
                    # remove them from the pad bookkeeping (total_pads =
                    # raw_rows_ever - valid must match the device counts)
                    self.raw_rows_ever -= dropped
                if src_rows:
                    self._fit_cov_model(n, valid, src_rows)
            elif (isinstance(retained, tuple) and retained
                  and retained[0] == "merge"):
                # planned level merge: packed scalar, retained masked
                # arrays for the plan-free recompute on overflow
                n = int(arr)
                ovf, n = bool(n >> 31), n & 0x7FFFFFFF
                if ovf:
                    self._note_overflow()
                    _, has_hi, margs = retained
                    k2, l2, h2, n2 = _final_compact_fn(
                        self.key_bits, (), has_hi, True
                    )(*margs)
                    if run[2] is None:
                        h2 = None  # keep the run's hi-drop decision
                    run = self._replace_run(lvl, run, (k2, l2, h2))
                    n = int(n2) & 0x7FFFFFFF
            else:
                n = int(arr)
            level = self.dedup_levels[lvl]
            try:
                i = next(j for j, r in enumerate(level) if r is run)
            except StopIteration:
                continue  # already consumed by a further merge
            k2, l2, h2 = self._shrink(run[0], run[1], run[2], n)
            level[i] = self._maybe_pack(lvl, (k2, l2, h2), n)

    @staticmethod
    def _shrink(keys, lo, hi, n: int):
        """Truncate a compacted run to an eighth-pow2 capacity >= n
        (base 2^(bl-3) gives cap/n < 1 + 2^(bl-3)/2^(bl-1) = 1.25x true
        worst-case waste; the bounded mantissa keeps the set of jitted
        shapes small). Tight caps are what keep forced pair-merges of
        large runs inside the merge memory budget."""
        M = keys.shape[0]
        bl = max(10, (max(n, 1) - 1).bit_length())
        base = 1 << max(8, bl - 3)
        cap = base * ((max(n, 1) + base - 1) // base)
        if cap >= M:
            return keys, lo, hi
        fn = _shrink_fn(cap, hi is not None)
        if hi is None:
            k2, l2 = fn(keys, lo)
            return k2, l2, None
        return fn(keys, lo, hi)

    def _all_dedup(self):
        return [r for level in self.dedup_levels for r in level]

    # -- inspection -----------------------------------------------------------

    def occupied_levels(self):
        """All live device arrays (sync/debug helper)."""
        out = [(k,) for k in self.raw]
        out.extend(self.masked0)
        for r in self._all_dedup():
            if isinstance(r, PackedRun):
                out.append((r.stream, r.index, r.esc_pos, r.esc_lo,
                            r.esc_hi))
            else:
                out.append(tuple(x for x in r if x is not None))
        return out

    def device_bytes(self) -> int:
        total = 0
        for arrays in self.occupied_levels():
            total += sum(int(np.prod(x.shape)) * 4 for x in arrays)
        return total

    def total_pads(self) -> int:
        """Exact count of PAD rows inserted via raw runs (one device sum)."""
        if not self.valid_scalars:
            return 0
        lo, hi = _sum_scalars_fn(len(self.valid_scalars))(*self.valid_scalars)
        total_valid = int(lo) | (int(hi) << 32)
        return self.raw_rows_ever - total_valid

    # -- extraction -----------------------------------------------------------

    def finalize(self):
        """Combine everything and compact. Returns (keys, lo, hi, n, pads):
        real entries in the ascending dense prefix [0, n); `pads` must be
        subtracted from the trailing all-ones entry by the caller (and the
        entry dropped if it reaches zero)."""
        # raw rows have unbounded duplicates: consolidate them first so the
        # final combine only sees deduplicated runs (bounded duplicates for
        # merge_many's log-scan)
        self._consolidate()
        # resolve BEFORE the final merge so it sees the smallest shapes —
        # and BEFORE the pad total: a clean presliced grain adjusts
        # raw_rows_ever at resolve time
        self._resolve_pending_shrinks()
        pads = self.residual_pads + self.total_pads()
        # masked drain leftovers are valid deduplicated merge inputs
        runs = list(self.masked0) + [
            (r[:2] if r[2] is None else r)
            for r in (self._materialize(x) for x in self._all_dedup())
        ]
        self.masked0 = []
        if not runs:
            keys = jnp.full((1, self.W), 0xFFFFFFFF, dtype=jnp.uint32)
            z = jnp.zeros(1, dtype=jnp.uint32)
            return keys, z, z, 0, 0
        # staged pre-merges: one merge_many call must never exceed the
        # input budget (_merge_rows_budget) — an oversized run list is
        # first merged in budget-sized groups (each compacts toward the
        # distinct count, so this converges in very few stages)
        budget = self._merge_rows_budget()
        while (len(runs) > 2
               and sum(r[0].shape[0] for r in runs) > budget):
            new_runs = []
            i = 0
            while i < len(runs):
                grp, rows = [runs[i]], runs[i][0].shape[0]
                i += 1
                while i < len(runs) and (
                    len(grp) < 2 or rows + runs[i][0].shape[0] <= budget
                ):
                    rows += runs[i][0].shape[0]
                    grp.append(runs[i])
                    i += 1
                if len(grp) == 1:
                    new_runs.append(grp[0])
                    continue
                ar = tuple(len(r) for r in grp)
                ag = [x for r in grp for x in r]
                k, l, h, nn = _merge_general_fn(
                    ar, True, self.key_bits
                )(*ag)
                k, l, h = self._shrink(k, l, h, int(nn))
                new_runs.append((k, l) if h is None else (k, l, h))
            if len(new_runs) >= len(runs):
                break  # runs individually huge: no further split possible
            runs = new_runs

        arity = tuple(len(r) for r in runs)
        args = [x for r in runs for x in r]
        total_rows = sum(r[0].shape[0] for r in runs)
        plan = self._final_plan(total_rows) if total_rows <= budget else ()
        if plan:
            # masked merge + planned compact (see _final_compact_fn);
            # the synchronous n fetch doubles as the ovf check, and the
            # masked arrays are retained until it passes. has_hi gates on
            # total_weight too — see _maybe_merge_dedup (the hi carry of
            # all-2-tuple merges would otherwise be discarded)
            has_hi = (any(a == 3 for a in arity)
                      or self.total_weight >= (1 << 32))
            mk, ml, mh, _ = _merge_general_fn(
                arity, False, self.key_bits
            )(*args)
            margs = (mk, ml, mh) if has_hi else (mk, ml)
            k2, l2, h2, n_dev = _final_compact_fn(
                self.key_bits, plan, has_hi, False
            )(*margs)
            n_raw = int(n_dev)
            if n_raw >> 31:  # rowsort overflow: recompute plan-free
                self._note_overflow()
                k2, l2, h2, n_dev = _final_compact_fn(
                    self.key_bits, (), has_hi, True
                )(*margs)
                n_raw = int(n_dev)
            n = n_raw & 0x7FFFFFFF
        else:
            k2, l2, h2, n = _merge_general_fn(
                arity, True, self.key_bits
            )(*args)
        if h2 is None:
            h2 = jnp.zeros_like(l2)
        self.raw, self.raw_rows = [], 0
        self.valid_scalars = []
        self.raw_rows_ever = 0
        self.residual_pads = pads
        for level in self.dedup_levels:
            level.clear()
        n = int(n)
        if self.pack_resting and self.key_bits is not None and n > 0:
            # the resting copy is bit-packed; the caller still gets the
            # dense arrays of THIS finalize (already materialized)
            self.dedup_levels[-1].append(
                pack_run(k2, l2, h2, n, self.key_bits)
            )
        else:
            self.dedup_levels[-1].append((k2, l2, h2))
        return k2, l2, h2, n, pads

    def reset(self) -> None:
        self._pending_shrinks = []
        self.density_est = None
        self._cov_model = None
        self._cold = True
        self._raw_valid = []
        self.spec_overflows = 0
        self._plan_margin = 1.2
        self.raw, self.raw_rows = [], 0
        self.masked0 = []
        self.valid_scalars = []
        self.raw_rows_ever = 0
        self.total_weight = 0
        self.residual_pads = 0
        for level in self.dedup_levels:
            level.clear()
        self.total_inserted = 0
