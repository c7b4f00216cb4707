"""Bit-packed resting representation of finalized (sorted, deduplicated,
compacted) count runs — the HBM-capacity analogue of the reference's
Offsets bit-packing (offsets_key_value.hpp:241-267; doc/jellyfish.tex:
128-134 derives 2k-l+r+1 bits per entry at 2^l slots).

A resting run in the dense store costs (W+1 or W+2) * 32 bits/entry
(96-128 at k=21) while the information content is ~2k + r bits. This
module packs a finalized run into:

  - a u32 BITSTREAM of fixed-width records: (2k - p) low key bits +
    `cbits` count bits per entry (the top p key bits are IMPLIED by the
    bucket, below);
  - a BUCKET INDEX [2^p + 1] u32: entries are sorted, so all keys with
    the same top-p bits form one contiguous slice; the index stores the
    slice boundaries (exclusive prefix, searchsorted against the sorted
    keys — the same implied-prefix trick as the reference's position-
    implies-low-bits, transposed to a dense sorted array);
  - an ESCAPE list for counts >= 2**cbits - 1 (positions + 64-bit
    counts), the analogue of the reference's large-key overflow entries
    (large_hash_array.hpp:603-643) — exactness is never sacrificed.

Bits/entry = (2k - p) + cbits + (2^p * 32 + escapes * 96) / n. With
k=21, p=20, cbits=7 and n = 33M entries: 22 + 7 + ~1 = ~30 bits/entry
vs 96 dense — a 3.2x capacity gain, within ~10% of the reference's 28.

Pack/unpack are pure vector programs (no gathers): field bits expand to
a [n, width] bool matrix, flatten, and fold 32-at-a-time into u32 words
via weighted sums; unpack inverts with shifts. Cost ~(width + 32)
element-ops per entry — a fraction of one sort pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.ops import multiword as mw

__all__ = [
    "pack_run", "unpack_run", "packed_nbytes", "PackedRun",
    "pack_run_batched", "unpack_run_batched", "PackedRunBatch",
]


class PackedRun:
    """Host-side handle of a packed resting run (device buffers inside)."""

    __slots__ = ("stream", "index", "esc_pos", "esc_lo", "esc_hi", "n",
                 "key_bits", "p", "cbits", "W")

    def __init__(self, stream, index, esc_pos, esc_lo, esc_hi, n,
                 key_bits, p, cbits, W):
        self.stream = stream
        self.index = index
        self.esc_pos = esc_pos
        self.esc_lo = esc_lo
        self.esc_hi = esc_hi
        self.n = int(n)
        self.key_bits = int(key_bits)
        self.p = int(p)
        self.cbits = int(cbits)
        self.W = int(W)

    def device_bytes(self) -> int:
        total = 0
        for x in (self.stream, self.index, self.esc_pos, self.esc_lo,
                  self.esc_hi):
            total += int(np.prod(x.shape)) * 4
        return total


def _field_width(key_bits: int, p: int, cbits: int) -> int:
    return key_bits - p + cbits


# slice rows for the bit fold/unfold: the naive [n, width] u32 bit
# matrix costs n*width*4 bytes (12 GB at a 100M-row resting run) — the
# fold instead lax.maps over row slices, bounding temporaries at
# ~S*width*4 bytes. S % 32 == 0 keeps every slice's bit count
# word-aligned for any width.
_FOLD_ROWS = 1 << 15


def _fold_one(lowk, cfield, kbits_low: int, cbits: int):
    """[S, W] low key bits + [S] count field -> [S*width/32] u32 words
    (LSB-first per record, rows concatenated)."""
    cols = []
    for j in range(kbits_low):
        cols.append((lowk[:, j // 32] >> jnp.uint32(j % 32)) & 1)
    for j in range(cbits):
        cols.append((cfield >> jnp.uint32(j)) & 1)
    bits = jnp.stack(cols, axis=1).astype(jnp.uint32)
    flat = bits.reshape(-1)
    pad = (-flat.shape[0]) % 32
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, dtype=jnp.uint32)])
    words = flat.reshape(-1, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(words * weights[None, :], axis=1, dtype=jnp.uint32)


def _fold_bits(lowk, cfield, kbits_low: int, cbits: int):
    n, W = lowk.shape
    width = kbits_low + cbits
    if n <= _FOLD_ROWS:
        return _fold_one(lowk, cfield, kbits_low, cbits)
    S = _FOLD_ROWS
    padded = (n + S - 1) // S * S
    lowk_p = jnp.concatenate(
        [lowk, jnp.zeros((padded - n, W), dtype=jnp.uint32)]
    )
    cf_p = jnp.concatenate(
        [cfield, jnp.zeros(padded - n, dtype=jnp.uint32)]
    )
    words = jax.lax.map(
        lambda sl: _fold_one(sl[0], sl[1], kbits_low, cbits),
        (lowk_p.reshape(-1, S, W), cf_p.reshape(-1, S)),
    ).reshape(-1)
    # zero-padded tail rows fold to zero words; the true stream is the
    # aligned prefix (identical to the single-shot zero pad)
    return words[: (n * width + 31) // 32]


def _unfold_bits(stream, n: int, W: int, kbits_low: int, cbits: int):
    """Inverse of _fold_bits: -> (lowk [n, W], cfield [n])."""
    width = kbits_low + cbits

    def one(words, rows):
        weights = jnp.arange(32, dtype=jnp.uint32)
        bits = ((words[:, None] >> weights[None, :]) & 1).reshape(-1)
        bits = bits[: rows * width].reshape(rows, width)
        lowk = jnp.zeros((rows, W), dtype=jnp.uint32)
        for j in range(kbits_low):
            lowk = lowk.at[:, j // 32].add(bits[:, j] << jnp.uint32(j % 32))
        cfield = jnp.zeros(rows, dtype=jnp.uint32)
        for j in range(cbits):
            cfield = cfield + (bits[:, kbits_low + j] << jnp.uint32(j))
        return lowk, cfield

    if n <= _FOLD_ROWS:
        return one(stream, n)
    S = _FOLD_ROWS
    padded = (n + S - 1) // S * S
    wps = S * width // 32
    need = padded * width // 32
    stream_p = jnp.concatenate(
        [stream, jnp.zeros(need - stream.shape[0], dtype=jnp.uint32)]
    )
    lowk, cfield = jax.lax.map(
        lambda ws: one(ws, S), stream_p.reshape(-1, wps)
    )
    return lowk.reshape(padded, W)[:n], cfield.reshape(-1)[:n]


@functools.partial(
    jax.jit, static_argnames=("key_bits", "p", "cbits", "n_cap", "esc_cap")
)
def _pack_fn(keys, lo, hi, key_bits, p, cbits, n_cap, esc_cap):
    W = keys.shape[1]
    width = _field_width(key_bits, p, cbits)
    iota = jnp.arange(n_cap, dtype=jnp.uint32)

    kslice = keys[:n_cap]
    lo_s = lo[:n_cap]
    hi_s = hi[:n_cap] if hi is not None else jnp.zeros_like(lo_s)

    # bucket index: keys sorted ascending -> searchsorted of the top-p
    # bits' bucket edges. Compute each key's bucket then bincount-free
    # boundaries via a monotone comparison against the edge values.
    top = mw.mw_shift_right(kslice, key_bits - p)[:, 0]  # p <= 32
    # the genuine all-ones entry is stored with the full 32-bit PAD
    # pattern (above 2^key_bits): clamp it into the last bucket — its
    # low bits pack as all-ones and unpack restores the canonical
    # pattern below
    top = jnp.minimum(top, jnp.uint32((1 << p) - 1))
    # one-hot-free histogram: for sorted buckets, index = searchsorted;
    # jnp.searchsorted on device is log(n) compares per edge over 2^p
    # edges — fine as a single vectorized op
    edges = jnp.arange((1 << p) + 1, dtype=jnp.uint32)
    index = jnp.searchsorted(top, edges, side="left").astype(jnp.uint32)

    # low key bits + count field
    lowk = mw.mw_and_mask_top(kslice, key_bits - p)
    esc_max = jnp.uint32((1 << cbits) - 1)
    big = (hi_s != 0) | (lo_s >= esc_max)
    cfield = jnp.where(big, esc_max, lo_s)
    stream = _fold_bits(lowk, cfield, key_bits - p, cbits)

    # escape list: positions of big counts in the dense prefix, packed
    # to a static capacity via a compacting sort on (is_big, position)
    esc_rank = jnp.where(big, iota, jnp.uint32(0xFFFFFFFF))
    s = jax.lax.sort([esc_rank, lo_s, hi_s], num_keys=1, is_stable=False)
    esc_pos = s[0][:esc_cap]
    esc_lo = s[1][:esc_cap]
    esc_hi = s[2][:esc_cap]
    n_esc = jnp.sum(big.astype(jnp.uint32))
    overflowed = n_esc > jnp.uint32(esc_cap)
    return stream, index, esc_pos, esc_lo, esc_hi, overflowed


@functools.partial(
    jax.jit, static_argnames=("key_bits", "p", "cbits", "W", "n_cap")
)
def _unpack_fn(stream, index, esc_pos, esc_lo, esc_hi, key_bits, p,
               cbits, W, n_cap):
    iota = jnp.arange(n_cap, dtype=jnp.uint32)
    lowk, cfield = _unfold_bits(stream, n_cap, W, key_bits - p, cbits)

    # top-p bits from the bucket index: bucket of entry i = #edges whose
    # prefix-count <= i (searchsorted on the monotone index)
    bucket = (
        jnp.searchsorted(index, iota, side="right").astype(jnp.uint32) - 1
    )
    topk = mw.mw_shift_left(
        bucket[:, None].astype(jnp.uint32), key_bits - p, W_out=W
    )
    keys = mw.mw_or(topk, lowk)
    # restore the store's canonical all-ones convention: the genuine
    # all-ones key is represented with the full 32-bit PAD pattern in
    # every limb (same canonicalization as ops/count._widen_top)
    is_ones = jnp.ones(n_cap, dtype=bool)
    for w in range(W):
        bits_w = min(32, key_bits - 32 * w)
        lim = jnp.uint32((1 << bits_w) - 1 if bits_w < 32 else 0xFFFFFFFF)
        is_ones = is_ones & (keys[:, w] == lim)
    keys = jnp.where(is_ones[:, None], jnp.uint32(0xFFFFFFFF), keys)

    # escapes: scatter exact counts back over the sentinel fields
    esc_max = jnp.uint32((1 << cbits) - 1)
    lo = cfield
    hi = jnp.zeros(n_cap, dtype=jnp.uint32)
    lo = lo.at[esc_pos].set(esc_lo, mode="drop")
    hi = hi.at[esc_pos].set(esc_hi, mode="drop")
    return keys, lo, hi


def pack_run(keys, lo, hi, n: int, key_bits: int, *, p: int | None = None,
             cbits: int = 7, esc_cap: int | None = None) -> PackedRun:
    """Pack the dense prefix [0, n) of a finalized run.

    keys [M, W] ascending in [0, n), lo/hi counts (hi may be None).
    p defaults to clamp(log2(n) - 4, 1, 20) (and < key_bits) — the
    implied-prefix width, sized so the bucket index costs ~0.25
    bits/entry;
    esc_cap defaults to max(1024, n // 64) escape slots (counts needing
    > cbits bits are rare by construction: cbits=7 covers < 127).
    Raises if the escape capacity overflows (caller repacks with a
    bigger cap; count distribution makes this pathological-only)."""
    M, W = keys.shape
    if p is None:
        p = min(20, key_bits - 1, max(1, max(n, 2).bit_length() - 5))
    if esc_cap is None:
        esc_cap = max(1024, n // 64)
    esc_cap = min(esc_cap, max(n, 1))
    stream, index, esc_pos, esc_lo, esc_hi, overflowed = _pack_fn(
        keys, lo, hi, key_bits, p, cbits, n, esc_cap
    )
    if bool(overflowed):
        if esc_cap >= n:
            raise AssertionError("escape capacity cannot exceed n")
        return pack_run(keys, lo, hi, n, key_bits, p=p, cbits=cbits,
                        esc_cap=min(4 * esc_cap, n))
    return PackedRun(stream, index, esc_pos, esc_lo, esc_hi, n,
                     key_bits, p, cbits, W)


def unpack_run(run: PackedRun):
    """Inverse of pack_run: (keys [n, W], lo [n], hi [n]) ascending."""
    return _unpack_fn(
        run.stream, run.index, run.esc_pos, run.esc_lo, run.esc_hi,
        run.key_bits, run.p, run.cbits, run.W, run.n,
    )


class PackedRunBatch:
    """Sharded variant of PackedRun: every buffer carries a leading [P]
    shard axis (kept sharded on the mesh by the caller). All shards pack
    at the COMMON capacity n_cap — rows past a shard's own occupancy are
    the inert PAD pattern (all-ones key, count 0), which packs into the
    last bucket with no escapes and unpacks back to canonical PADs, so
    per-shard occupancy differences cost only the capacity slack."""

    __slots__ = ("stream", "index", "esc_pos", "esc_lo", "esc_hi",
                 "n_cap", "key_bits", "p", "cbits", "W", "P")

    def __init__(self, stream, index, esc_pos, esc_lo, esc_hi, n_cap,
                 key_bits, p, cbits, W, P):
        self.stream = stream
        self.index = index
        self.esc_pos = esc_pos
        self.esc_lo = esc_lo
        self.esc_hi = esc_hi
        self.n_cap = int(n_cap)
        self.key_bits = int(key_bits)
        self.p = int(p)
        self.cbits = int(cbits)
        self.W = int(W)
        self.P = int(P)

    def device_bytes(self) -> int:
        total = 0
        for x in (self.stream, self.index, self.esc_pos, self.esc_lo,
                  self.esc_hi):
            total += int(np.prod(x.shape)) * 4
        return total


@functools.partial(
    jax.jit, static_argnames=("key_bits", "p", "cbits", "n_cap", "esc_cap")
)
def _pack_batched_jit(keys, lo, hi, key_bits, p, cbits, n_cap, esc_cap):
    def per_shard(k_, l_, h_):
        return _pack_fn(k_, l_, h_, key_bits, p, cbits, n_cap, esc_cap)

    s, i, ep, el, eh, ovf = jax.vmap(per_shard)(keys, lo, hi)
    # replicated scalar: every process reads the same global any-reduce,
    # so the host retry decision stays consistent on multi-host meshes
    return s, i, ep, el, eh, jnp.any(ovf)


@functools.partial(
    jax.jit, static_argnames=("key_bits", "p", "cbits", "W", "n_cap")
)
def _unpack_batched_jit(stream, index, esc_pos, esc_lo, esc_hi, key_bits,
                        p, cbits, W, n_cap):
    def per_shard(s_, i_, ep_, el_, eh_):
        return _unpack_fn(s_, i_, ep_, el_, eh_, key_bits, p, cbits, W,
                          n_cap)

    return jax.vmap(per_shard)(stream, index, esc_pos, esc_lo, esc_hi)


def pack_run_batched(keys, lo, hi, n_cap: int, key_bits: int, *,
                     p: int | None = None, cbits: int = 7,
                     esc_cap: int | None = None) -> PackedRunBatch:
    """Pack a sharded compacted run ([P, M, W] keys, [P, M] counts, hi
    may be None) at the common capacity n_cap (every shard's occupancy
    <= n_cap; rows in [n_shard, n_cap) must already be PAD)."""
    P, M, W = keys.shape
    if hi is None:
        hi = jnp.zeros_like(lo)
    if p is None:
        p = min(20, key_bits - 1, max(1, max(n_cap, 2).bit_length() - 5))
    if esc_cap is None:
        esc_cap = max(1024, n_cap // 64)
    esc_cap = min(esc_cap, max(n_cap, 1))
    while True:
        s, i, ep, el, eh, ovf = _pack_batched_jit(
            keys, lo, hi, key_bits, p, cbits, n_cap, esc_cap
        )
        if not bool(ovf):
            return PackedRunBatch(s, i, ep, el, eh, n_cap, key_bits, p,
                                  cbits, W, P)
        if esc_cap >= n_cap:
            raise AssertionError("escape capacity cannot exceed n_cap")
        esc_cap = min(4 * esc_cap, n_cap)


def unpack_run_batched(run: PackedRunBatch):
    """Inverse of pack_run_batched: ([P, n_cap, W] keys, lo, hi)."""
    return _unpack_batched_jit(
        run.stream, run.index, run.esc_pos, run.esc_lo, run.esc_hi,
        run.key_bits, run.p, run.cbits, run.W, run.n_cap,
    )


def packed_nbytes(n: int, key_bits: int, p: int | None = None,
                  cbits: int = 7, esc: int = 0) -> int:
    """Capacity model: bytes to hold n entries packed (mem subcommand
    docs). Mirrors the reference's 2^l*(2k-l+r+1)/8 formula
    (large_hash_array.hpp:106-115) for the dense sorted layout."""
    if p is None:
        p = min(20, key_bits - 1, max(1, max(n, 2).bit_length() - 5))
    width = _field_width(key_bits, p, cbits)
    stream = (n * width + 31) // 32 * 4
    index = ((1 << p) + 1) * 4
    return stream + index + esc * 12
