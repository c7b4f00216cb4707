"""Multi-chip k-mer counting: hash-prefix sharded table over a device mesh.

The reference's only parallelism is N pthreads CAS-ing into one shared table
(count_main.cc:152-184, large_hash_array.hpp:716-752). The TPU-native design
shards the *table* across chips by hash prefix and the *input* across chips
by chunk (data parallel ingest):

    owner(sortkey) = top log2(P) bits of sortkey = top bits of hash position

Each device ingests its own chunk, extracts/hashes/dedups locally, then an
all-to-all over the `shards` mesh axis routes every (sortkey, count) pair to
its owner shard — the collective rides ICI. Because sortkeys are ordered by
(pos, key) and owners are the top position bits, shard p owns one contiguous
range of the global hash order: the final dump is just the shard-order
concatenation of per-shard sorted runs (no merge machinery; compare the
reference's mer_heap + token_ring recovery, sorted_dumper.hpp:57-101).

Exactness: the exchange is capacity-free — device s sends to owner d a
full-length masked copy of its deduplicated run (non-owned slots are PAD with
count 0), so no entry can ever be dropped regardless of hash skew. This
trades bandwidth (P x the compacted volume) for static shapes; a
ragged-all-to-all compaction is a planned optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from jellyfish_tpu.gf2 import GF2Matrix
from jellyfish_tpu.counter import ceil_log2
from jellyfish_tpu.ops import multiword as mw
from jellyfish_tpu.ops.count import merge_runs, sort_unique
from jellyfish_tpu.ops.hashing import mers_of_sortkeys, sortkey_of_mers
from jellyfish_tpu.ops.mers import encode_codes, extract_mers

__all__ = ["ShardedMerCounter", "make_mesh"]

AXIS = "shards"


def make_mesh(n_shards: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the `shards` axis."""
    if devices is None:
        devices = jax.devices()
        if n_shards is not None:
            devices = devices[:n_shards]
    return Mesh(np.array(devices), (AXIS,))


def _owner_of_sortkeys(sortkeys, counts, c: int, log_p: int):
    """Owner shard of each entry: top log_p bits of the 2k-bit sortkey.
    PAD entries (count == 0) get owner -1 (sent nowhere)."""
    if log_p == 0:
        return jnp.where(counts == 0, -1, 0).astype(jnp.int32)
    top = mw.mw_shift_right(sortkeys, c - log_p)
    owner = top[..., 0].astype(jnp.int32) & ((1 << log_p) - 1)
    return jnp.where(counts == 0, -1, owner)


def _exchange_and_count(keys, counts, c: int, n_shards: int):
    """Inside shard_map: route each entry to its owner shard, then dedup.

    keys [N, W], counts [N] (a local deduplicated run). Returns a run of
    capacity n_shards * N holding every entry this shard owns globally.
    """
    N, W = keys.shape
    log_p = ceil_log2(n_shards)
    owner = _owner_of_sortkeys(keys, counts, c, log_p)

    dst = jnp.arange(n_shards, dtype=jnp.int32)
    send_mask = owner[None, :] == dst[:, None]  # [P, N]
    sent_counts = jnp.where(send_mask, counts[None, :], 0)
    sent_keys = jnp.where(
        send_mask[..., None], keys[None, :, :], jnp.uint32(0xFFFFFFFF)
    )

    if n_shards > 1:
        recv_keys = jax.lax.all_to_all(
            sent_keys, AXIS, split_axis=0, concat_axis=0, tiled=True
        )
        recv_counts = jax.lax.all_to_all(
            sent_counts, AXIS, split_axis=0, concat_axis=0, tiled=True
        )
    else:
        recv_keys, recv_counts = sent_keys, sent_counts

    flat_keys = recv_keys.reshape(n_shards * N, W)
    flat_counts = recv_counts.reshape(n_shards * N)
    return sort_unique(flat_keys, flat_counts)


def _build_step(mesh, k: int, lsize: int, canonical: bool, has_matrix: bool):
    """Jitted per-step program: [P, L] chunks -> per-shard owned runs."""
    n_shards = mesh.devices.size
    c = 2 * k

    def local(chunk, bit_matrix):
        chunk = chunk.reshape(-1)  # [1, L] block -> [L]
        codes = encode_codes(chunk)
        mers, valid = extract_mers(codes, k, canonical)
        sk = sortkey_of_mers(mers, bit_matrix, k, lsize)
        keys, counts = sort_unique(sk, valid.astype(jnp.uint32))
        rkeys, rcounts = _exchange_and_count(keys, counts, c, n_shards)
        return rkeys[None], rcounts[None]

    a_spec = PartitionSpec() if has_matrix else None
    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(PartitionSpec(AXIS, None), a_spec),
        out_specs=(PartitionSpec(AXIS, None, None), PartitionSpec(AXIS, None)),
    )
    return jax.jit(shard_fn)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
def _merge_batched(a_keys, a_lo, a_hi, b_keys, b_lo, b_hi):
    return jax.vmap(merge_runs)(a_keys, a_lo, a_hi, b_keys, b_lo, b_hi)


class _ShardedStore:
    """Per-shard LSM of sorted runs: arrays carry a leading [P] shard axis
    sharded over the mesh, so every merge stays chip-local (no collectives)."""

    def __init__(self, mesh, W: int, max_levels: int = 28):
        self.W = W
        self.mesh = mesh
        self.levels: list = [None] * max_levels

    def insert_run(self, keys, lo, hi) -> None:
        carry = (keys, lo, hi)
        lvl = 0
        while self.levels[lvl] is not None:
            a = self.levels[lvl]
            k2, l2, h2, _ = _merge_batched(
                a[0], a[1], a[2], carry[0], carry[1], carry[2]
            )
            carry = (k2, l2, h2)
            self.levels[lvl] = None
            lvl += 1
            if lvl >= len(self.levels):
                raise RuntimeError("LSM store exceeded maximum level count")
        self.levels[lvl] = carry

    def finalize(self):
        """Merge all levels; returns (keys [P, M, W], lo, hi, ns [P])."""
        runs = [r for r in self.levels if r is not None]
        if not runs:
            return None
        acc = runs[0]
        ns = None
        for r in runs[1:]:
            k2, l2, h2, ns = _merge_batched(
                acc[0], acc[1], acc[2], r[0], r[1], r[2]
            )
            acc = (k2, l2, h2)
        if ns is None:
            ns = jnp.sum((acc[1] | acc[2]) != 0, axis=-1)
        self.levels = [None] * len(self.levels)
        self.levels[0] = acc
        return acc[0], acc[1], acc[2], ns

    def reset(self):
        self.levels = [None] * len(self.levels)


class ShardedMerCounter:
    """Hash-prefix sharded k-mer counter over a device mesh.

    The multi-chip equivalent of MerCounter: same sortkey order, same dump
    semantics; the table lives partitioned across all chips of the mesh.
    """

    def __init__(
        self,
        k: int,
        size: int,
        mesh: Mesh | None = None,
        canonical: bool = False,
        matrix: GF2Matrix | None = None,
        rng: np.random.Generator | None = None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_shards = int(self.mesh.devices.size)
        self.k = int(k)
        c = 2 * self.k
        self.W = mw.nwords(c)
        log_p = ceil_log2(self.n_shards)
        self.lsize = max(log_p, min(ceil_log2(size), c if c <= 64 else 64), 1)
        self.size = 1 << self.lsize
        self.canonical = bool(canonical)
        if matrix is not None:
            if matrix.r != self.lsize or matrix.c != c:
                raise ValueError(
                    f"matrix is {matrix.r}x{matrix.c}, need {self.lsize}x{c}"
                )
            self.matrix = matrix
        elif self.lsize == c:
            self.matrix = GF2Matrix.identity(c)
        else:
            rng = rng or np.random.default_rng()
            self.matrix = GF2Matrix.random_invertible(self.lsize, c, rng)

        if self.matrix.is_low_identity() and self.lsize == c:
            self._A = None
            self._Ainv = None
        else:
            self._A = jnp.asarray(self.matrix.bit_matrix())
            self._Ainv = jnp.asarray(self.matrix.inverse_bit_matrix())

        self._step = _build_step(
            self.mesh, self.k, self.lsize, self.canonical, self._A is not None
        )
        self.store = _ShardedStore(self.mesh, self.W)
        self._run_sharding = NamedSharding(self.mesh, PartitionSpec(AXIS))

    # -- ingestion ------------------------------------------------------------

    def add_chunks(self, chunks: np.ndarray) -> None:
        """Count the k-mers of [P, L] uint8 chunks, one per shard. Chunk
        semantics match MerCounter.add_chunk (separator bytes between reads,
        k-1 overlap between consecutive chunks of one stream)."""
        if chunks.ndim != 2 or chunks.shape[0] != self.n_shards:
            raise ValueError(f"expected [{self.n_shards}, L] chunks")
        sharding = NamedSharding(self.mesh, PartitionSpec(AXIS, None))
        dev = jax.device_put(jnp.asarray(chunks, dtype=jnp.uint8), sharding)
        keys, counts = self._step(dev, self._A)
        zeros = jnp.zeros_like(counts)
        self.store.insert_run(keys, counts, zeros)

    def step(self, chunks_dev):
        """One jitted counting step on device-resident chunks (bench path)."""
        return self._step(chunks_dev, self._A)

    # -- extraction -----------------------------------------------------------

    def finalize(self):
        """(mers object ints, counts uint64) in global hash order: shard 0's
        run, then shard 1's, ... (owners are contiguous sortkey ranges)."""
        res = self.store.finalize()
        if res is None:
            return np.zeros(0, dtype=object), np.zeros(0, dtype=np.uint64)
        keys, lo, hi, ns = res
        keys_np = np.asarray(jax.device_get(keys))
        lo_np = np.asarray(jax.device_get(lo))
        hi_np = np.asarray(jax.device_get(hi))
        ns_np = np.asarray(jax.device_get(ns))
        parts_k, parts_c = [], []
        for p in range(self.n_shards):
            n = int(ns_np[p])
            if n == 0:
                continue
            parts_k.append(keys_np[p, :n])
            cnt = lo_np[p, :n].astype(np.uint64) | (
                hi_np[p, :n].astype(np.uint64) << np.uint64(32)
            )
            parts_c.append(cnt)
        if not parts_k:
            return np.zeros(0, dtype=object), np.zeros(0, dtype=np.uint64)
        sortkeys = np.concatenate(parts_k, axis=0)
        counts = np.concatenate(parts_c, axis=0)
        mers_dev = mers_of_sortkeys(
            jnp.asarray(sortkeys), self._Ainv, self.k, self.lsize
        )
        return mw.to_ints(np.asarray(mers_dev)), counts

    def reset(self) -> None:
        self.store.reset()
