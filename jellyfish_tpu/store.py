"""HBM-resident sorted-run LSM store of (sortkey, count64) pairs.

This replaces the reference's lock-free open-addressing table + cooperative
size-doubling (large_hash_array.hpp, hash_counter.hpp:178-238). Runs arrive
already deduplicated and hash-sorted (ops/count.sort_unique); the store keeps
a binary-counter ladder of sorted runs (level i holds one run of capacity
B * 2^i) and merges carry-style on insert — the amortized-O(log) analogue of
size doubling, but with static shapes per level so XLA compiles each merge
exactly once.

The full table materializes only at finalize() (dump/spill), already in hash
order — the reference needs its mer_heap + token-ring machinery
(sorted_dumper.hpp:57-101) to recover that order from a scrambled table; here
it's the resting state of the data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.ops.count import merge_runs

__all__ = ["SortedCountStore"]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
def _merge(a_keys, a_lo, a_hi, b_keys, b_lo, b_hi):
    return merge_runs(a_keys, a_lo, a_hi, b_keys, b_lo, b_hi)


class SortedCountStore:
    """Binary-counter LSM of sorted deduplicated runs."""

    def __init__(self, W: int, max_levels: int = 28):
        self.W = W
        self.levels: list = [None] * max_levels
        self.total_inserted = 0  # number of level-0 runs inserted

    def insert_run(self, keys, lo, hi) -> None:
        """Insert a deduplicated sorted run (counts 64-bit as lo/hi uint32)."""
        assert keys.shape[-1] == self.W
        carry = (keys, lo, hi)
        lvl = 0
        while self.levels[lvl] is not None:
            a = self.levels[lvl]
            k2, l2, h2, _ = _merge(a[0], a[1], a[2], carry[0], carry[1], carry[2])
            carry = (k2, l2, h2)
            self.levels[lvl] = None
            lvl += 1
            if lvl >= len(self.levels):
                raise RuntimeError("LSM store exceeded maximum level count")
        self.levels[lvl] = carry
        self.total_inserted += 1

    def occupied_levels(self):
        return [r for r in self.levels if r is not None]

    def finalize(self):
        """Merge every level into one run. Returns (keys, lo, hi, n_distinct)
        where real entries occupy the dense ascending prefix [0, n)."""
        runs = self.occupied_levels()
        if not runs:
            keys = jnp.full((1, self.W), 0xFFFFFFFF, dtype=jnp.uint32)
            z = jnp.zeros(1, dtype=jnp.uint32)
            return keys, z, z, 0
        acc = runs[0]
        n = None
        for r in runs[1:]:
            k2, l2, h2, n = _merge(acc[0], acc[1], acc[2], r[0], r[1], r[2])
            acc = (k2, l2, h2)
        if n is None:
            n = jnp.sum((acc[1] | acc[2]) != 0)
        self.levels = [None] * len(self.levels)
        self.levels[self._level_for(acc[0].shape[0])] = acc
        return acc[0], acc[1], acc[2], int(n)

    def _level_for(self, capacity: int) -> int:
        # place a finalized run back at a level high enough for its capacity
        lvl = 0
        while lvl + 1 < len(self.levels) and self.levels[lvl] is not None:
            lvl += 1
        return lvl

    def reset(self) -> None:
        self.levels = [None] * len(self.levels)
        self.total_inserted = 0

    def device_bytes(self) -> int:
        total = 0
        for r in self.occupied_levels():
            total += sum(int(np.prod(x.shape)) * 4 for x in r)
        return total
