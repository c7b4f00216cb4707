"""HBM-resident forest store of (sortkey, count64) runs.

This replaces the reference's lock-free open-addressing table + cooperative
size-doubling (large_hash_array.hpp, hash_counter.hpp:178-238) with a
branching-factor-R log-structured forest:

  - level 0 accepts RAW runs straight from the extraction pipeline
    (unsorted, weights in {0,1}, duplicates allowed) — no per-chunk sort;
  - when a level accumulates R runs, ONE jitted program concatenates them
    and K-way combines with a single sort pass;
  - merged runs stay masked-in-place (no compaction scatters) until
    finalize(), whose compacted output IS the reference's dump order.

Design driven by measured TPU costs: lax.sort passes and per-dispatch
latency dominate, so the store minimizes sorted-element passes (log_R
instead of log_2), auxiliary O(M) passes (raw merges need no cumulative
sums or count payloads — counts are segment lengths), and dispatches (one
per R inserts, amortized). The reference needs mer_heap + token-ring
machinery to recover dump order from its reprobe-scrambled table
(sorted_dumper.hpp:57-101); here hash order is the resting state.

Count-width bookkeeping: runs created while the store has seen < 2^32
total weight carry no hi limb (counts provably fit u32); the general
merge path keeps exact 64-bit counts once that no longer holds.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.ops.count import merge_many, merge_raw

__all__ = ["SortedCountStore"]


class Run(NamedTuple):
    keys: object          # [M, W] uint32
    lo: object            # [M] uint32
    hi: Optional[object]  # [M] uint32 or None (counts < 2^32)
    raw: bool             # weights in {0,1}, unsorted, duplicates allowed

    def arrays(self):
        return (self.keys, self.lo) if self.hi is None else (
            self.keys, self.lo, self.hi
        )


@functools.lru_cache(maxsize=128)
def _merge_raw_fn(n_runs: int, use_vword: bool):
    """Concat n raw (keys, weights) runs and combine via merge_raw."""

    @functools.partial(jax.jit, donate_argnums=tuple(range(2 * n_runs)))
    def f(*args):
        keys = jnp.concatenate(args[0::2], axis=0)
        w = jnp.concatenate(args[1::2], axis=0)
        return merge_raw(keys, w, use_vword)

    return f


@functools.lru_cache(maxsize=128)
def _merge_general_fn(arity: tuple, use_vword: bool, compact: bool):
    """Concat runs of mixed shapes/widths and combine via merge_many.
    arity[i] is 2 (keys, lo) or 3 (keys, lo, hi) for run i."""
    n_args = sum(arity)
    any_hi = any(a == 3 for a in arity)

    @functools.partial(jax.jit, donate_argnums=tuple(range(n_args)))
    def f(*args):
        keys, lo, hi = [], [], []
        off = 0
        for a in arity:
            keys.append(args[off])
            lo.append(args[off + 1])
            if any_hi:
                if a == 3:
                    hi.append(args[off + 2])
                else:
                    hi.append(jnp.zeros_like(args[off + 1]))
            off += a
        k = jnp.concatenate(keys, axis=0)
        l = jnp.concatenate(lo, axis=0)
        h = jnp.concatenate(hi, axis=0) if any_hi else None
        return merge_many(k, l, h, use_vword=use_vword, compact=compact)

    return f


class SortedCountStore:
    """Branching-factor-R forest of (sortkey, count) runs.

    use_vword: validity must ride the sort as its own operand only when a
    real sortkey can be all-ones, i.e. when the key width fills its limbs
    exactly (2k % 32 == 0); callers pass key_bits to decide.
    """

    def __init__(self, W: int, branch: int = 8, max_levels: int = 16,
                 key_bits: int | None = None):
        self.W = W
        self.branch = int(branch)
        self.use_vword = key_bits is None or key_bits % 32 == 0
        self.levels: list[list[Run]] = [[] for _ in range(max_levels)]
        self.total_inserted = 0
        self.total_weight = 0  # python int: upper bound on any single count

    def insert_raw(self, keys, weights, max_weight: int | None = None) -> None:
        """Insert a raw pipeline run (weights in {0,1})."""
        self.levels[0].append(Run(keys, weights, None, True))
        self.total_weight += int(
            max_weight if max_weight is not None else keys.shape[0]
        )
        self._bump()

    def insert_run(self, keys, lo, hi=None, total: int | None = None) -> None:
        """Insert a deduplicated (or filtered) run; hi may be None when all
        counts are < 2^32."""
        self.levels[0].append(Run(keys, lo, hi, False))
        self.total_weight += int(total if total is not None else keys.shape[0])
        self._bump()

    def _bump(self):
        self.total_inserted += 1
        lvl = 0
        while len(self.levels[lvl]) >= self.branch:
            group = self.levels[lvl]
            self.levels[lvl] = []
            merged = self._merge_group(group, compact=False)
            if lvl + 1 >= len(self.levels):
                raise RuntimeError("forest store exceeded maximum level count")
            self.levels[lvl + 1].append(merged)
            lvl += 1

    def _merge_group(self, group: list[Run], compact: bool) -> Run:
        if all(r.raw for r in group) and self.total_weight < (1 << 32):
            args = []
            for r in group:
                args += [r.keys, r.lo]
            k2, c2 = _merge_raw_fn(len(group), self.use_vword)(*args)
            return Run(k2, c2, None, False)
        arity = tuple(2 if r.hi is None else 3 for r in group)
        args = [x for r in group for x in r.arrays()]
        k2, l2, h2, _ = _merge_general_fn(
            arity, self.use_vword, compact
        )(*args)
        return Run(k2, l2, h2, False)

    def occupied_runs(self):
        return [r for level in self.levels for r in level]

    # back-compat alias (bench warm-up sync iterates this)
    def occupied_levels(self):
        return [r.arrays() for r in self.occupied_runs()]

    def finalize(self):
        """Combine every run into one. Returns (keys, lo, hi, n_distinct)
        with real entries in the dense ascending prefix [0, n)."""
        runs = self.occupied_runs()
        if not runs:
            keys = jnp.full((1, self.W), 0xFFFFFFFF, dtype=jnp.uint32)
            z = jnp.zeros(1, dtype=jnp.uint32)
            return keys, z, z, 0
        # finalize always goes through the general compacting path: it
        # normalizes raw/filtered/masked runs to the dense-prefix invariant
        arity = tuple(2 if r.hi is None else 3 for r in runs)
        args = [x for r in runs for x in r.arrays()]
        k2, l2, h2, n = _merge_general_fn(arity, self.use_vword, True)(*args)
        if h2 is None:
            h2 = jnp.zeros_like(l2)  # finalize contract: hi always present
        for level in self.levels:
            level.clear()
        self.levels[-1].append(Run(k2, l2, h2, False))
        return k2, l2, h2, int(n)

    def reset(self) -> None:
        for level in self.levels:
            level.clear()
        self.total_inserted = 0
        self.total_weight = 0

    def device_bytes(self) -> int:
        total = 0
        for r in self.occupied_runs():
            total += sum(int(np.prod(x.shape)) * 4 for x in r.arrays())
        return total
