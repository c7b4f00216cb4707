"""Vectorized mer extraction: ASCII chunk -> [N, W] canonical 2-bit mers.

This is the TPU replacement for the reference's per-base scalar loop
(mer_iterator.hpp:53-81 + mer_dna.hpp shift_left/shift_right): instead of
sliding one mer register along the sequence, every window of the chunk is
materialized at once with k shifted adds over the whole chunk (VPU work), and
validity (N's / read boundaries / chunk tail) is a cumulative-sum mask —
the vector analogue of the parser's 'N'-separator convention
(mer_overlap_sequence_parser.hpp:164-216).

Conventions (identical to mer_dna.hpp):
  - A=0 C=1 G=2 T=3 (mer_dna.hpp:38-55); case-insensitive; anything else
    (including the 0xFF padding and read separators) is invalid.
  - A mer is the 2k-bit big-endian base-4 integer of its window, held as
    little-endian uint32 limbs.
  - reverse complement via checkered-mask bit tricks (mer_dna.hpp:83-100).
  - canonical = min(mer, revcomp) (mer_dna.hpp:428-431).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.ops import multiword as mw

__all__ = [
    "code_table",
    "encode_codes",
    "extract_mers",
    "extract_mers_phased",
    "extract_mers_packed",
    "reverse_complement",
    "canonicalize",
    "mers_from_codes",
]

INVALID = np.uint8(0xFF)

# Separator byte the host parser inserts between reads (never a valid base).
SEPARATOR = 0xFF


@functools.cache
def code_table() -> np.ndarray:
    """256-entry byte -> code table; invalid bases map to 0xFF."""
    t = np.full(256, INVALID, dtype=np.uint8)
    for i, b in enumerate(b"ACGT"):
        t[b] = i
    for i, b in enumerate(b"acgt"):
        t[b] = i
    return t


def encode_codes(chunk_u8):
    """[L] uint8 ASCII -> [L] uint8 codes (0..3 valid, 0xFF invalid).

    Pure arithmetic (no LUT gather — gathers are slow on TPU):
    t = (ch >> 1) & 3 maps A->0 C->1 G->3 T->2; t ^ (t >> 1) swaps 2<->3,
    yielding the reference code order A0 C1 G2 T3 (mer_dna.hpp:38-55).
    Validity = case-folded membership in {ACGT}."""
    ch = chunk_u8
    t = (ch >> np.uint8(1)) & np.uint8(3)
    code = t ^ (t >> np.uint8(1))
    lower = ch | np.uint8(0x20)
    valid = (
        (lower == np.uint8(ord("a")))
        | (lower == np.uint8(ord("c")))
        | (lower == np.uint8(ord("g")))
        | (lower == np.uint8(ord("t")))
    )
    return jnp.where(valid, code, INVALID)


def _rc_word(w):
    """Reverse the 2-bit groups of a uint32 and complement them
    (word_reverse_complement, mer_dna.hpp:83-90, on 32-bit words)."""
    w = ((w >> np.uint32(2)) & np.uint32(0x33333333)) | (
        (w & np.uint32(0x33333333)) << np.uint32(2)
    )
    w = ((w >> np.uint32(4)) & np.uint32(0x0F0F0F0F)) | (
        (w & np.uint32(0x0F0F0F0F)) << np.uint32(4)
    )
    w = ((w >> np.uint32(8)) & np.uint32(0x00FF00FF)) | (
        (w & np.uint32(0x00FF00FF)) << np.uint32(8)
    )
    w = (w >> np.uint32(16)) | (w << np.uint32(16))
    return ~w


def reverse_complement(mers, k: int):
    """[N, W] mers -> reverse complements."""
    W = mers.shape[-1]
    rc = jnp.stack([_rc_word(mers[..., W - 1 - w]) for w in range(W)], axis=-1)
    rc = mw.mw_shift_right(rc, 32 * W - 2 * k)
    return mw.mw_and_mask_top(rc, 2 * k)


def canonicalize(mers, k: int):
    rc = reverse_complement(mers, k)
    return mw.mw_min(mers, rc)


def extract_mers(codes, k: int, canonical: bool):
    """codes [L] uint8 -> (mers [N, W] uint32, valid [N] bool), N = L-k+1.

    mers[i] = the k-mer starting at position i; valid[i] iff the window
    contains no invalid code.
    """
    L = codes.shape[0]
    N = L - k + 1
    W = mw.nwords(2 * k)

    bad = (codes > 3).astype(jnp.int32)
    # valid[i] <=> sum(bad[i:i+k]) == 0
    csum = jnp.cumsum(bad)
    csum0 = jnp.concatenate([jnp.zeros(1, dtype=jnp.int32), csum])
    valid = (csum0[k:] - csum0[:N]) == 0

    c2 = (codes & np.uint8(3)).astype(jnp.uint32)
    # big-endian: code j of the window sits at bit 2*(k-1-j)
    limbs = []
    for w in range(W):
        acc = jnp.zeros(N, dtype=jnp.uint32)
        for j in range(k):
            bitpos = 2 * (k - 1 - j)
            if bitpos // 32 != w:
                continue
            sh = np.uint32(bitpos % 32)
            acc = acc | (jax.lax.dynamic_slice_in_dim(c2, j, N) << sh)
        limbs.append(acc)
    mers = jnp.stack(limbs, axis=-1)

    if canonical:
        mers = canonicalize(mers, k)
    return mers, valid


def mers_from_codes(codes, k: int, canonical: bool):
    """Alias used by the counting pipeline."""
    return extract_mers(codes, k, canonical)


def extract_mers_phased(codes, k: int, canonical: bool):
    """Phase-major window extraction: ~3W element-ops per window instead of
    extract_mers' k (decisive for large k; ~2x pipeline for k=21).

    Codes are packed 16 bases per u32 big-endian; a window starting at
    i = 16m + phi reads its limbs as 32-bit funnel reads of the packed
    stream at STATIC shifts per (phi, limb) — the 16 phases are 16
    independent strided subproblems.

    Output order is PHASE-MAJOR, not positional (windows of phase 0, then
    phase 1, ...): only valid for order-free consumers (the counting
    pipeline sorts right after). Returns (mers [16*Mp, W], valid [16*Mp]).
    """
    L = codes.shape[0]
    if L < k:
        raise ValueError("chunk shorter than k")
    N = L - k + 1
    W = mw.nwords(2 * k)
    Mp = (L - k) // 16 + 1  # per-phase window capacity

    # validity of positional windows (same cumsum trick as extract_mers)
    bad = (codes > 3).astype(jnp.int32)
    csum = jnp.cumsum(bad)
    csum0 = jnp.concatenate([jnp.zeros(1, dtype=jnp.int32), csum])
    valid = (csum0[k:] - csum0[:N]) == 0
    # positional -> phase-major: index (phi, m) = 16m + phi
    valid_pm = jnp.pad(valid, (0, 16 * Mp - N)).reshape(Mp, 16).T.reshape(-1)

    # pack 16 codes per u32, big-endian within the word
    Lp = ((L + 15) // 16) * 16
    c2 = (jnp.pad(codes, (0, Lp - L)) & np.uint8(3)).astype(jnp.uint32)
    cw = c2.reshape(-1, 16)
    pw = jnp.zeros(cw.shape[0], dtype=jnp.uint32)
    for t in range(16):
        pw = pw | (cw[:, t] << np.uint32(2 * (15 - t)))
    # prepend one zero word so all read offsets are non-negative; pad the
    # tail so every funnel read is in range
    guard = 2 + (2 * k + 30) // 32
    pw = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.uint32), pw,
         jnp.zeros(guard, dtype=jnp.uint32)]
    )

    def read32(off_bits: int):
        """[Mp] big-endian 32-bit reads at bit offset 32m + off_bits."""
        q, r = divmod(off_bits, 32)
        a = jax.lax.dynamic_slice_in_dim(pw, q, Mp)
        if r == 0:
            return a
        b = jax.lax.dynamic_slice_in_dim(pw, q + 1, Mp)
        return (a << np.uint32(r)) | (b >> np.uint32(32 - r))

    phase_limbs = []  # [16][W] arrays of [Mp]
    for phi in range(16):
        limbs = []
        for w in range(W):
            # little-endian limb w covers BE bits [2k-32(w+1), 2k-32w)
            off = 32 + 2 * phi + 2 * k - 32 * (w + 1)
            limbs.append(read32(off))
        phase_limbs.append(limbs)

    mers = jnp.stack(
        [jnp.stack(pl_, axis=-1) for pl_ in phase_limbs], axis=0
    ).reshape(16 * Mp, W)
    mers = mw.mw_and_mask_top(mers, 2 * k)

    if canonical:
        mers = canonicalize(mers, k)
    return mers, valid_pm


def _phased_windows_from_pwords(pw, k: int, Mp: int):
    """Funnel-read the [16][W] phase limb arrays from a packed-code word
    stream (one zero word prepended, guard-padded)."""
    W = mw.nwords(2 * k)

    def read32(off_bits: int):
        q, r = divmod(off_bits, 32)
        a = jax.lax.dynamic_slice_in_dim(pw, q, Mp)
        if r == 0:
            return a
        b = jax.lax.dynamic_slice_in_dim(pw, q + 1, Mp)
        return (a << np.uint32(r)) | (b >> np.uint32(32 - r))

    phase_limbs = []
    for phi in range(16):
        limbs = []
        for w in range(W):
            off = 32 + 2 * phi + 2 * k - 32 * (w + 1)
            limbs.append(read32(off))
        phase_limbs.append(limbs)
    mers = jnp.stack(
        [jnp.stack(pl_, axis=-1) for pl_ in phase_limbs], axis=0
    ).reshape(16 * Mp, W)
    return mw.mw_and_mask_top(mers, 2 * k)


def _window_invalid_stream(validbits, k: int):
    """Sliding-window OR of the BAD bitstream: output bit i (little-endian
    within u32 words) = some base in [i, i+k) is invalid. log2(k) packed
    passes on L/32 words (overlap-tolerant doubling since OR is
    idempotent)."""
    nv = validbits.shape[0]
    guard = (k + 31) // 32 + 1
    bad = jnp.concatenate(
        [~validbits, jnp.zeros(guard, dtype=jnp.uint32)]
    )

    def stream_shift(S, d: int):
        q, r = divmod(d, 32)
        a = jax.lax.dynamic_slice_in_dim(S, q, nv)
        if r == 0:
            return a
        b = jax.lax.dynamic_slice_in_dim(S, q + 1, nv)
        return (a >> np.uint32(r)) | (b << np.uint32(32 - r))

    A = bad[:nv]
    cov = 1
    while cov < k:
        d = min(cov, k - cov)
        Apad = jnp.concatenate([A, jnp.zeros(guard, dtype=jnp.uint32)])
        # recompute from the padded ORIGINAL coverage: A covers cov bits,
        # shifting A by d and OR-ing extends coverage to cov + d (overlap
        # is fine: OR is idempotent)
        q, r = divmod(d, 32)
        a = jax.lax.dynamic_slice_in_dim(Apad, q, nv)
        if r:
            b = jax.lax.dynamic_slice_in_dim(Apad, q + 1, nv)
            a = (a >> np.uint32(r)) | (b << np.uint32(32 - r))
        A = A | a
        cov += d
    return A  # bit i set => window i invalid (meaningful for i < N)


def extract_mers_packed(pwords, validbits, k: int, L: int, canonical: bool):
    """Packed-input phase-major extraction: host supplies 2-bit codes
    (16/u32, big-endian in word — native/chunker.cpp jf_pack_chunk) and a
    per-base validity bitstream. 4.25x less host->device traffic than
    ASCII bytes and no device encode pass.

    Returns (mers [16*Mp, W], valid [16*Mp] bool) in phase-major order
    (order-free consumers only)."""
    if L < k:
        raise ValueError("chunk shorter than k")
    N = L - k + 1
    Mp = (L - k) // 16 + 1

    guard = 2 + (2 * k + 30) // 32
    pw = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.uint32), pwords,
         jnp.zeros(guard, dtype=jnp.uint32)]
    )
    mers = _phased_windows_from_pwords(pw, k, Mp)

    inv = _window_invalid_stream(validbits, k)
    # phase-major expansion: window (phi, m) = stream bit 16m + phi;
    # word j holds (phi, m=2j) at bit phi and (phi, m=2j+1) at bit phi+16
    nv = inv.shape[0]
    miota = jnp.arange(Mp, dtype=jnp.int32)
    phases = []
    for phi in range(16):
        even = (inv >> np.uint32(phi)) & jnp.uint32(1)
        odd = (inv >> np.uint32(phi + 16)) & jnp.uint32(1)
        v = jnp.stack([even, odd], axis=1).reshape(2 * nv)[:Mp] == 0
        v = v & (16 * miota + phi < N)
        phases.append(v)
    valid_pm = jnp.stack(phases, axis=0).reshape(16 * Mp)

    if canonical:
        mers = canonicalize(mers, k)
    return mers, valid_pm
