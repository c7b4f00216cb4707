"""Batched GF(2) matrix hashing on the MXU + hash-order sort keys.

The reference hashes one mer at a time with an XOR-selected-columns loop
(rectangular_binary_matrix.hpp:224-261). Here the whole batch is hashed with
ONE bit-matrix multiply on the MXU:

    pos_bits[N, l] = key_bits[N, c] @ A[c, l]  (mod 2)

where c = 2k, l = log2(table size), and A is GF2Matrix.bit_matrix(). The
product of 0/1 entries is computed exactly in float32 (values <= c <= 2^24)
and reduced mod 2.

The TPU-native "table" order is the reference's dump order
(sorted_dumper.hpp + mer_heap.hpp:26-30 order by (pos, key)): since pos is a
bijection of the key's low l bits given its high bits (the pseudo-square
matrix construction, see gf2.py), ordering by (pos, key) equals ordering by
the 2k-bit integer

    sortkey = (pos << (2k - l)) | (key >> l)

which is itself a bijection of the key. The sorted-run store keeps sortkeys;
keys are recovered in bulk with the inverse matrix only at dump time —
the same memory trick the reference plays by storing only `2k - l` raw key
bits per slot (offsets_key_value.hpp, doc/jellyfish.tex:128-134).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.ops import multiword as mw

__all__ = [
    "bits_of_words",
    "words_of_bits",
    "gf2_times",
    "gf2_apply_masks",
    "masks_of_matrix",
    "inverse_masks_of_matrix",
    "sortkey_of_mers",
    "mers_of_sortkeys",
]


def bits_of_words(x):
    """[N, W] uint32 -> [N, 32*W] uint8 little-endian bits."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (x[..., None] >> shifts) & jnp.uint32(1)
    return b.reshape(*x.shape[:-1], 32 * x.shape[-1]).astype(jnp.uint8)


def words_of_bits(bits, W: int):
    """[N, nb] uint8 bits (little-endian) -> [N, W] uint32."""
    nb = bits.shape[-1]
    pad = 32 * W - nb
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    b = bits.reshape(*bits.shape[:-1], W, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def gf2_times(keys, bit_matrix, out_words: int):
    """Batched hash: [N, W] keys x A[c, l] -> [N, out_words] uint32.

    bit_matrix columns beyond the key width are ignored by construction
    (bits beyond 2k are zero).
    """
    c, l = bit_matrix.shape
    kb = bits_of_words(keys)[..., :c].astype(jnp.float32)
    a = jnp.asarray(bit_matrix, dtype=jnp.float32)
    prod = jax.lax.dot_general(
        kb, a, (((kb.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pos_bits = (prod.astype(jnp.int32) & 1).astype(jnp.uint8)
    return words_of_bits(pos_bits, out_words)


def masks_of_matrix(matrix, W: int) -> np.ndarray:
    """Per-output-bit key masks [r, W] uint32 for gf2_apply_masks.

    masks[j, w] bit b set  <=>  key bit 32w+b participates in pos bit j
    (the column-selection XOR of rectangular_binary_matrix.hpp:224-261,
    re-expressed as AND + parity per output bit)."""
    bm = matrix.bit_matrix()  # [c, r] uint8, little-endian key bit order
    c, r = bm.shape
    masks = np.zeros((r, W), np.uint32)
    ii, jj = np.nonzero(bm)
    np.bitwise_or.at(
        masks, (jj, ii // 32), np.uint32(1) << (ii % 32).astype(np.uint32)
    )
    return masks


def inverse_masks_of_matrix(matrix, W: int) -> np.ndarray:
    return masks_of_matrix(matrix.pseudo_inverse(), W)


def gf2_apply_masks(keys, masks, out_words: int):
    """Batched GF(2) product via AND + population-count parity.

    keys [..., W] uint32, masks [l, W] uint32 -> [..., out_words] uint32.
    Pure u32 lane arithmetic: unlike the f32 MXU formulation (gf2_times)
    this materializes no [N, 2k] intermediate — XLA fuses the whole chain
    into one pass over the keys. parity(a) ^ parity(b) == parity(a ^ b),
    so limbs fold with XOR before a single popcount."""
    import jax

    l = masks.shape[0]
    W = keys.shape[-1]
    out = []
    for ow in range(out_words):
        acc = jnp.zeros(keys.shape[:-1], dtype=jnp.uint32)
        for j in range(ow * 32, min(l, (ow + 1) * 32)):
            t = keys[..., 0] & masks[j, 0]
            for w in range(1, W):
                t = t ^ (keys[..., w] & masks[j, w])
            bit = jax.lax.population_count(t) & jnp.uint32(1)
            acc = acc | (bit << jnp.uint32(j - ow * 32))
        out.append(acc)
    return jnp.stack(out, axis=-1)


def sortkey_of_mers(mers, masks, k: int, lsize: int):
    """[N, W] mers -> [N, W] sortkeys = (pos << (2k-l)) | (key >> l)."""
    c = 2 * k
    W = mers.shape[-1]
    if masks is None:
        # identity hash (size >= 4^k, large_hash_array.hpp:997-1001):
        # pos = key & mask, high key bits zero -> sortkey = key itself.
        return mers
    pos = gf2_apply_masks(mers, masks, mw.nwords(lsize))
    pos = mw.mw_and_mask_top(pos, lsize)
    hi = mw.mw_shift_left(pos, c - lsize, W_out=W)
    lo = mw.mw_shift_right(mers, lsize)
    return mw.mw_and_mask_top(mw.mw_or(hi, lo), c)


def mers_of_sortkeys(sortkeys, inv_masks, k: int, lsize: int):
    """Invert sortkey_of_mers for a batch (used at dump time).

    key_high = sortkey low (2k-l) bits; pos = sortkey >> (2k-l);
    key_low = Binv . ((key_high << l) | pos)   [l bits]
    (the iterator-side reconstruction, large_hash_iterator.hpp:53,92 +
    large_hash_array.hpp:847-858).
    """
    c = 2 * k
    W = sortkeys.shape[-1]
    if inv_masks is None:
        return sortkeys
    pos = mw.mw_shift_right(sortkeys, c - lsize)
    pos = mw.mw_and_mask_top(pos, lsize)[..., : mw.nwords(lsize)]
    key_high = mw.mw_and_mask_top(sortkeys, c - lsize)
    h = mw.mw_or(mw.mw_shift_left(key_high, lsize, W_out=W), pos)
    key_low = gf2_apply_masks(h, inv_masks, mw.nwords(lsize))
    key_low = mw.mw_and_mask_top(key_low, lsize)
    key = mw.mw_or(mw.mw_shift_left(key_high, lsize, W_out=W), key_low)
    return mw.mw_and_mask_top(key, c)
