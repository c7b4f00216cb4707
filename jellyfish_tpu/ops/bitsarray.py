"""Generic n-bits-per-entry device array (atomic_bits_array analogue).

The reference's `atomic_bits_array` (atomic_bits_array.hpp:83-97) packs
`size` entries of `bits` bits each into machine words — entries never
straddle words (entries/word = word_bits / bits, floored) — and mutates
them with per-entry CAS loops. Its designated role (SURVEY §2.1) is the
generic scatter-update counter behind the bloom structures.

The TPU replacement keeps the exact packed layout but swaps per-entry CAS
for BATCHED jitted updates: a batch of (id, value) pairs is applied in one
device program whose result equals applying the pairs sequentially in
batch order (last-wins for `set`, order-free for `fetch_or`/`fetch_max`).
Conflict resolution is sort + segmented combine (the house primitive —
scatters with duplicate indices are nondeterministic in XLA and measured
~10x an elementwise pass), followed by one gather/scatter over UNIQUE
words only.

`jellyfish_tpu.bloom` keeps its own fused insert kernels (they combine
probe-position generation with the update); this module is the standalone
general-purpose structure, file-compatible with a plain little-endian
word dump like the reference's mmap-backed variant
(atomic_bits_array.hpp:146-165).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BitsArray"]

_W = 32  # container word bits (uint32 words on device)


@functools.partial(jax.jit, static_argnums=(2, 3, 4), donate_argnums=(0,))
def _apply_batch(data, ids_vals, bits: int, op: str, size: int):
    """Apply a batch of (id, value) updates to the packed word array.

    op: 'set' (last occurrence of an id wins — the sequential CAS
    outcome), 'or', or 'max' (order-free). ids >= size are dropped,
    letting callers pad batches to a static shape.
    """
    ids, vals = ids_vals
    n = ids.shape[0]
    epw = _W // bits
    mask = jnp.uint32((1 << bits) - 1)
    vals = vals.astype(jnp.uint32) & mask

    # resolve per-id conflicts: sort by (id, seq) so the batch-order-last
    # value of each id lands at its segment end
    seq = jnp.arange(n, dtype=jnp.uint32)
    sid, _, sval = jax.lax.sort([ids.astype(jnp.uint32), seq, vals],
                                num_keys=2, is_stable=False)
    if op in ("or", "max"):
        # order-free: fold the whole id-segment into its last row
        d = 1
        cur = sval
        while d < n:
            same = (jnp.arange(n) >= d) & (sid == jnp.roll(sid, d))
            prev = jnp.where(same, jnp.roll(cur, d), jnp.uint32(0))
            cur = (cur | prev) if op == "or" else jnp.maximum(cur, prev)
            d *= 2
        sval = cur
    is_last_id = (sid != jnp.roll(sid, -1)).at[n - 1].set(True)
    is_last_id = is_last_id & (sid < jnp.uint32(size))

    # per-word combine: ids sorted => word indices sorted; after id-dedup
    # the masks of distinct ids within one word are disjoint, so the word
    # update is (old & ~OR(masks)) | OR(shifted vals). Contributing rows
    # of one word can be any distance apart (a neighbouring id's segment
    # sits between them), so the fold runs the full log2(n) distances.
    n_words = data.shape[0]
    # dropped ids (>= size) get a sentinel word group of their own so they
    # can never claim a real word's last-row slot
    q = jnp.where(sid < jnp.uint32(size), sid // jnp.uint32(epw),
                  jnp.uint32(n_words))
    off = (sid % jnp.uint32(epw)) * jnp.uint32(bits)
    m_bits = jnp.where(is_last_id, mask << off, jnp.uint32(0))
    v_bits = jnp.where(is_last_id, sval << off, jnp.uint32(0))
    d = 1
    while d < n:
        same = (jnp.arange(n) >= d) & (q == jnp.roll(q, d))
        m_bits = m_bits | jnp.where(same, jnp.roll(m_bits, d), jnp.uint32(0))
        v_bits = v_bits | jnp.where(same, jnp.roll(v_bits, d), jnp.uint32(0))
        d *= 2
    is_last_w = (q != jnp.roll(q, -1)).at[n - 1].set(True)

    widx = jnp.where(is_last_w & (sid < jnp.uint32(size)),
                     q, jnp.uint32(n_words)).astype(jnp.int32)
    old = data.at[widx].get(mode="fill", fill_value=0)
    if op == "or":
        new = old | v_bits
    elif op == "max":
        # per-entry max needs entry-aligned comparison: field by field
        new = old
        for e in range(epw):
            fm = mask << jnp.uint32(e * bits)
            has = (m_bits & fm) != 0
            upd = jnp.maximum(old & fm, v_bits & fm)
            new = jnp.where(has, (new & ~fm) | upd, new)
    else:
        new = (old & ~m_bits) | v_bits
    return data.at[widx].set(new, mode="drop")


@functools.partial(jax.jit, static_argnums=(2,))
def _get_batch(data, ids, bits: int):
    epw = _W // bits
    mask = jnp.uint32((1 << bits) - 1)
    ids = ids.astype(jnp.uint32)
    q = (ids // jnp.uint32(epw)).astype(jnp.int32)
    off = (ids % jnp.uint32(epw)) * jnp.uint32(bits)
    words = data.at[q].get(mode="fill", fill_value=0)
    return (words >> off) & mask


class BitsArray:
    """Device-resident packed array of `size` entries of `bits` bits.

    Batched mutators mirror atomic_bits_array's element_proxy semantics:
    `set` = sequential stores (last in batch order wins), `fetch_or` /
    `fetch_max` = the commutative CAS loops the bloom structures use.
    """

    def __init__(self, bits: int, size: int):
        if not 1 <= bits <= _W:
            raise ValueError("bits per entry must be in [1, 32]")
        self.bits = int(bits)
        self.size = int(size)
        self.entries_per_word = _W // self.bits
        n_words = (self.size + self.entries_per_word - 1) \
            // self.entries_per_word
        self.data = jnp.zeros(n_words, dtype=jnp.uint32)

    def set(self, ids, vals) -> None:
        self.data = _apply_batch(
            self.data, (jnp.asarray(ids), jnp.asarray(vals)),
            self.bits, "set", self.size,
        )

    def fetch_or(self, ids, vals) -> None:
        self.data = _apply_batch(
            self.data, (jnp.asarray(ids), jnp.asarray(vals)),
            self.bits, "or", self.size,
        )

    def fetch_max(self, ids, vals) -> None:
        self.data = _apply_batch(
            self.data, (jnp.asarray(ids), jnp.asarray(vals)),
            self.bits, "max", self.size,
        )

    def get(self, ids):
        return np.asarray(_get_batch(self.data, jnp.asarray(ids), self.bits))

    def __getitem__(self, pos: int) -> int:
        return int(self.get(np.asarray([pos]))[0])

    def values(self) -> np.ndarray:
        """All entries, host-side (the reference's input iterator)."""
        words = np.asarray(self.data)
        epw = self.entries_per_word
        mask = (1 << self.bits) - 1
        offs = (np.arange(epw, dtype=np.uint32) * self.bits)[None, :]
        vals = (words[:, None] >> offs) & np.uint32(mask)
        return vals.reshape(-1)[: self.size]

    # -- persistence (mmap-backed variant parity) --------------------------

    def to_bytes(self) -> bytes:
        return np.asarray(self.data).astype("<u4").tobytes()

    @classmethod
    def from_bytes(cls, bits: int, size: int, raw: bytes) -> "BitsArray":
        a = cls(bits, size)
        words = np.frombuffer(raw, dtype="<u4").copy()
        if words.shape[0] != a.data.shape[0]:
            raise ValueError("byte length does not match bits/size")
        a.data = jnp.asarray(words)
        return a
