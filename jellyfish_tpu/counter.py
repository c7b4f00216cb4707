"""The TPU k-mer counting engine (replacement for sub_commands/count_main.cc).

Per fixed-size chunk, ONE jitted device program:

    2-bit codes (host-packed via native/chunker.cpp, or ASCII+device
    encode) -> phase-major window extraction -> canonical fold ->
    popcount GF(2) hash -> hash-order sortkeys, premasked to PAD

No per-chunk sort: raw sortkey runs accumulate in SortedCountStore, which
lazily consolidates with keys-only sorts (store.py). finalize() yields
the whole table in the reference's dump order (ascending (pos, key)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.gf2 import GF2Matrix
from jellyfish_tpu.ops import multiword as mw
from jellyfish_tpu.ops.count import consolidate_premasked, sort_unique
from jellyfish_tpu.ops.hashing import (
    inverse_masks_of_matrix,
    masks_of_matrix,
    mers_of_sortkeys,
    sortkey_of_mers,
)
from jellyfish_tpu.ops.mers import (
    encode_codes,
    extract_mers_packed,
    extract_mers_phased,
)
from jellyfish_tpu.store import SortedCountStore

__all__ = ["MerCounter", "ceil_log2"]


def ceil_log2(x: int) -> int:
    return max(0, (int(x) - 1).bit_length())


@functools.partial(jax.jit, static_argnames=("k", "lsize", "canonical"))
def _chunk_pipeline(chunk_u8, masks, k, lsize, canonical):
    """chunk bytes -> (premasked sortkeys, n_valid scalar). No per-chunk
    sort and no weight payload: invalid windows become the all-ones PAD
    pattern; the store sorts the raw backlog lazily and counts segments by
    length (store.py), with the PAD inflation of the all-ones segment
    corrected host-side from n_valid."""
    codes = encode_codes(chunk_u8)
    mers, valid = extract_mers_phased(codes, k, canonical)
    sk = sortkey_of_mers(mers, masks, k, lsize)
    sk = jnp.where(valid[:, None], sk, jnp.uint32(0xFFFFFFFF))
    return sk, jnp.sum(valid, dtype=jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("k", "lsize", "canonical", "L")
)
def _chunk_pipeline_packed(pwords, validbits, masks, k, lsize, canonical, L):
    """Packed-input variant of _chunk_pipeline: the host ships 2-bit codes
    + a validity bitstream (native/chunker.cpp jf_pack_chunk) — 4.25x less
    host->device traffic and no device encode pass."""
    mers, valid = extract_mers_packed(pwords, validbits, k, L, canonical)
    sk = sortkey_of_mers(mers, masks, k, lsize)
    sk = jnp.where(valid[:, None], sk, jnp.uint32(0xFFFFFFFF))
    return sk, jnp.sum(valid, dtype=jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("k", "lsize", "canonical", "L")
)
def _chunk_pipeline_packed_batch(pwords, validbits, masks, k, lsize,
                                 canonical, L):
    """Batch-of-chunks variant of _chunk_pipeline_packed: pwords [B, L/16],
    validbits [B, ceil(L/32)]. One dispatch processes B chunks (amortizes
    the fixed per-dispatch latency ~3ms over B times the work); chunks are
    extracted independently (no cross-chunk windows) and the sortkeys
    flattened into one raw run."""
    def one(pw, vb):
        mers, valid = extract_mers_packed(pw, vb, k, L, canonical)
        sk = sortkey_of_mers(mers, masks, k, lsize)
        sk = jnp.where(valid[:, None], sk, jnp.uint32(0xFFFFFFFF))
        return sk, jnp.sum(valid, dtype=jnp.uint32)

    sk, nv = jax.vmap(one, in_axes=(0, 0))(pwords, validbits)
    return sk.reshape(-1, sk.shape[-1]), jnp.sum(nv, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k", "lsize", "canonical"))
def _chunk_pipeline_dedup(chunk_u8, masks, k, lsize, canonical):
    """Deduplicated per-chunk variant (bloom-filter modes and --if need
    per-chunk distinct mers with multiplicities). The PAD segment keeps the
    pad-inflated count; callers pair it with the n_valid scalar."""
    sk, n_valid = _chunk_pipeline(chunk_u8, masks, k, lsize, canonical)
    keys, counts = consolidate_premasked(sk)
    # remove the PAD inflation on device: the last sorted row always ends
    # the final (all-ones-or-maximal) segment, and pads = N - n_valid
    pads = jnp.uint32(sk.shape[0]) - n_valid
    counts = counts.at[-1].add(jnp.uint32(0) - pads)
    return keys, counts


@functools.partial(jax.jit, static_argnames=("k", "lsize"))
def _recover_mers(sortkeys, inv_bit_matrix, k, lsize):
    return mers_of_sortkeys(sortkeys, inv_bit_matrix, k, lsize)


def _sortkey_order_view(rows: np.ndarray) -> np.ndarray:
    """1-D order-preserving comparable view of sortkey rows [n, W]
    (columns LSW..MSW): u64 for W <= 2, big-endian memcmp bytes beyond."""
    n, W = rows.shape
    if W == 1:
        return rows[:, 0]
    if W == 2:
        return np.ascontiguousarray(rows).view(np.uint64).ravel()
    be = np.ascontiguousarray(rows[:, ::-1]).byteswap()
    return np.ascontiguousarray(be).view(f"V{4 * W}").ravel()




class MerCounter:
    """Accumulates k-mer counts from sequence chunks.

    Equivalent of cooperative::hash_counter + large_hash::array for one chip.
    `size` plays the reference's -s role: it fixes lsize = ceil(log2(size))
    and hence the hash matrix shape and the dump order. If size >= 4^k the
    identity matrix is used (large_hash_array.hpp:997-1001).
    """

    def __init__(
        self,
        k: int,
        size: int,
        canonical: bool = False,
        matrix: GF2Matrix | None = None,
        rng: np.random.Generator | None = None,
        mer_filter=None,
        pack_resting: bool = False,
    ):
        self.k = int(k)
        c = 2 * self.k
        self.W = mw.nwords(c)
        # the table size rounds up to a power of two, so the identity
        # regime is reached as soon as the ROUNDED size hits 4^k — e.g.
        # k=7 with -s 16k (16000 -> 2^14 = 4^7). Mirrors the reference's
        # bounded array (large_hash_array.hpp:983-1006), whose lsize ==
        # key_len case uses the identity matrix.
        if c <= 64 and ceil_log2(size) >= c:
            self.lsize = c
            self.size = 1 << c
            self.matrix = matrix if matrix is not None else GF2Matrix.identity(c)
            if not self.matrix.is_low_identity():
                raise ValueError("size >= 4^k requires the identity matrix")
        else:
            self.lsize = max(1, min(ceil_log2(size), 64 if c > 64 else c))
            self.size = 1 << self.lsize
            if matrix is not None:
                self.matrix = matrix
                if matrix.r != self.lsize or matrix.c != c:
                    raise ValueError(
                        f"matrix is {matrix.r}x{matrix.c}, need {self.lsize}x{c}"
                    )
            else:
                rng = rng or np.random.default_rng()
                self.matrix = GF2Matrix.random_invertible(self.lsize, c, rng)
        self.canonical = bool(canonical)

        if self.matrix.is_identity() or (
            self.matrix.is_low_identity() and self.lsize == c
        ):
            self._A = None
            self._Ainv = None
        else:
            self._A = jnp.asarray(masks_of_matrix(self.matrix, self.W))
            self._Ainv = jnp.asarray(
                inverse_masks_of_matrix(self.matrix, self.W)
            )

        self.store = SortedCountStore(
            self.W, key_bits=c, pack_resting=pack_resting
        )
        # optional per-batch filter on (recovered mers, counts) -> counts,
        # the batch equivalent of the reference's filter chain
        # (count_main.cc:99-131; bloom --bc / --bf-size modes)
        self.mer_filter = mer_filter
        self._restrict_store: SortedCountStore | None = None

    # -- ingestion ------------------------------------------------------------

    def add_chunk(self, chunk_u8: np.ndarray) -> None:
        """Count all k-mers of a chunk of ASCII sequence (uint8). Reads must
        be separated by non-ACGT bytes; chunks of one stream must overlap by
        k-1 bytes (the parser guarantees both)."""
        if len(chunk_u8) < self.k:
            return
        chunk = jnp.asarray(chunk_u8, dtype=jnp.uint8)
        if self.mer_filter is not None:
            keys, counts = _chunk_pipeline_dedup(
                chunk, self._A,
                k=self.k, lsize=self.lsize, canonical=self.canonical,
            )
            mers = _recover_mers(keys, self._Ainv, k=self.k, lsize=self.lsize)
            new_counts = self.mer_filter(np.asarray(mers), np.asarray(counts))
            counts = jnp.asarray(new_counts.astype(np.uint32))
            self.store.insert_run(keys, counts, None, total=keys.shape[0])
        else:
            keys, n_valid = _chunk_pipeline(
                chunk, self._A,
                k=self.k, lsize=self.lsize, canonical=self.canonical,
            )
            self.store.insert_raw(keys, n_valid)

    def add_chunk_packed(self, pwords: np.ndarray,
                         validbits: np.ndarray) -> None:
        """Count k-mers of a host-packed chunk (see SequenceChunker
        .chunks_packed / native pack_chunk). Fast ingest path: 4.25x less
        transfer than add_chunk."""
        L = int(pwords.shape[0]) * 16
        if L < self.k:
            return
        keys, n_valid = _chunk_pipeline_packed(
            jnp.asarray(pwords, dtype=jnp.uint32),
            jnp.asarray(validbits, dtype=jnp.uint32),
            self._A, k=self.k, lsize=self.lsize,
            canonical=self.canonical, L=L,
        )
        self.store.insert_raw(keys, n_valid)

    def add_chunks_packed_batch(self, pwords: np.ndarray,
                                validbits: np.ndarray) -> None:
        """Batched fast-ingest: pwords [B, L/16], validbits [B, ceil(L/32)]
        — B equal-length packed chunks in ONE device dispatch."""
        L = int(pwords.shape[1]) * 16
        if L < self.k:
            return
        keys, n_valid = _chunk_pipeline_packed_batch(
            jnp.asarray(pwords, dtype=jnp.uint32),
            jnp.asarray(validbits, dtype=jnp.uint32),
            self._A, k=self.k, lsize=self.lsize,
            canonical=self.canonical, L=L,
        )
        self.store.insert_raw(keys, n_valid)

    def add_mers_np(self, mers_int_iterable, value: int = 1) -> None:
        """Host-side path to add explicit mers (used by bindings/tests)."""
        mers = list(mers_int_iterable)
        if not mers:
            return
        arr = jnp.asarray(mw.from_ints(mers, self.W))
        sk = sortkey_of_mers(arr, self._A, self.k, self.lsize)
        w = jnp.full(len(mers), value, dtype=jnp.uint32)
        keys, counts = sort_unique(sk, w)
        self.store.insert_run(
            keys, counts, None, total=len(mers) * int(value)
        )

    def restrict_to(self, chunks_iter) -> None:
        """--if mode (count_main.cc:288-295 PRIME/UPDATE semantics): after
        counting, only mers present in these chunks appear in the output."""
        self._restrict_store = SortedCountStore(self.W, key_bits=2 * self.k)
        for chunk_u8 in chunks_iter:
            if len(chunk_u8) < self.k:
                continue
            chunk = jnp.asarray(chunk_u8, dtype=jnp.uint8)
            keys, n_valid = _chunk_pipeline(
                chunk, self._A, k=self.k, lsize=self.lsize,
                canonical=self.canonical,
            )
            self._restrict_store.insert_raw(keys, n_valid)

    # -- extraction -----------------------------------------------------------

    @staticmethod
    def _fetch_counts_corrected(store, keys, lo, hi, n, pads):
        """Host counts with the all-ones PAD inflation removed. Also
        reports whether the trailing (all-ones) entry must be dropped.
        Fetches only the live slices; skips hi when counts provably fit
        u32 (store.total_weight)."""
        lo_np = np.asarray(lo[:n]).astype(np.uint64)
        if store.total_weight < (1 << 32):
            counts = lo_np
        else:
            counts = lo_np | (
                np.asarray(hi[:n]).astype(np.uint64) << np.uint64(32)
            )
        drop_last = False
        if pads:
            last_key = np.asarray(keys[n - 1 : n])
            if (last_key == np.uint32(0xFFFFFFFF)).all():
                if int(counts[-1]) < pads:
                    raise AssertionError(
                        "pad accounting mismatch: all-ones entry holds "
                        f"{int(counts[-1])} < {pads} pads — store invariant "
                        "violated (would corrupt output)"
                    )
                counts = counts.copy() if counts is lo_np else counts
                counts[-1] -= np.uint64(pads)
                drop_last = counts[-1] == 0
        return counts, drop_last

    def finalize_np(self):
        """Return (mer limbs [n, W] uint32, counts [n] uint64) in hash
        order (the reference's dump order: ascending (pos, key)). The fast
        bulk path: mers are recovered ON DEVICE before transfer (one fetch
        of the live slice; no host->device round trip)."""
        empty = (np.zeros((0, self.W), dtype=np.uint32),
                 np.zeros(0, dtype=np.uint64))
        keys, lo, hi, n, pads = self.store.finalize()
        if n == 0:
            if self._restrict_store is not None:
                # primed mers still dump with count 0 on empty input
                return self._apply_restriction(
                    keys, 0, False, np.zeros(0, dtype=np.uint64)
                )
            return empty
        counts, drop_last = self._fetch_counts_corrected(
            self.store, keys, lo, hi, n, pads
        )
        mers_dev = _recover_mers(keys, self._Ainv, k=self.k, lsize=self.lsize)
        mers = np.asarray(mers_dev[:n])
        if drop_last:
            mers, counts = mers[:-1], counts[:-1]
        if self._restrict_store is not None:
            # before the emptiness check: even a count run that trimmed
            # to nothing (input all Ns) must dump the primed set at 0
            return self._apply_restriction(keys, n, drop_last, counts)
        if len(counts) == 0:
            return empty
        return mers, counts

    def _apply_restriction(self, keys, n, drop_last, counts):
        """--if output: the PRIMED key set in hash order, each with its
        counted value or 0. The reference's PRIME pass claims every
        allowed mer with count 0 before counting (count_main.cc:288-295),
        so allowed-but-unseen mers APPEAR in the dump with count 0 (the
        documented 0-bucket histogram, doc/Readme.md); counting keys
        outside the primed set never enter. Both runs are hash-sorted
        under the same matrix: one vectorized binary search."""
        empty = (np.zeros((0, self.W), dtype=np.uint32),
                 np.zeros(0, dtype=np.uint64))
        akeys, alo, ahi, an, apads = self._restrict_store.finalize()
        if an == 0:
            return empty
        _, adrop = self._fetch_counts_corrected(
            self._restrict_store, akeys, alo, ahi, an, apads
        )
        akeys_np = np.asarray(akeys[:an])
        if adrop:
            akeys_np = akeys_np[:-1]
        if len(akeys_np) == 0:
            return empty
        keys_np = np.asarray(keys[:n])
        if drop_last:
            keys_np = keys_np[:-1]
        amers = np.asarray(_recover_mers(
            akeys, self._Ainv, k=self.k, lsize=self.lsize
        )[: len(akeys_np)])
        if len(keys_np) == 0:
            return amers, np.zeros(len(akeys_np), dtype=np.uint64)
        kv = _sortkey_order_view(keys_np)
        av = _sortkey_order_view(akeys_np)
        pos = np.minimum(np.searchsorted(kv, av), len(kv) - 1)
        match = kv[pos] == av
        out = np.where(match, counts[pos], np.uint64(0))
        return amers, out

    def finalize(self):
        """Return (mers [n] object ints, counts [n] uint64 np) in hash
        order (scripting convenience over finalize_np)."""
        mers, counts = self.finalize_np()
        if len(counts) == 0:
            return np.zeros(0, dtype=object), counts
        return mw.to_ints(mers), counts

    def reset(self) -> None:
        self.store.reset()
