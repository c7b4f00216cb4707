"""Multi-word (little-endian uint32 limbs) bit operations on [..., W] arrays.

The TPU has no native 64/128-bit integers worth using; every wide value
(2k-bit mers, hashes, sort keys) is a little-endian vector of uint32 limbs
along the trailing axis. All shifts here take STATIC python shift amounts so
everything stays trivially compilable/fusable by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "mw_zeros",
    "mw_shift_left",
    "mw_shift_right",
    "mw_or",
    "mw_and_mask_top",
    "mw_less",
    "mw_eq",
    "mw_min",
    "mw_select",
    "to_ints",
    "from_ints",
]

U32 = jnp.uint32


def nwords(bits: int) -> int:
    return max(1, (bits + 31) // 32)


def mw_zeros(shape, W: int):
    return jnp.zeros((*shape, W), dtype=U32)


def _limb(x, i: int):
    """Limb i of x, or zeros if out of range."""
    W = x.shape[-1]
    if 0 <= i < W:
        return x[..., i]
    return jnp.zeros(x.shape[:-1], dtype=U32)


def mw_shift_left(x, s: int, W_out: int | None = None):
    """x << s, output with W_out limbs (default: same as input)."""
    W = x.shape[-1] if W_out is None else W_out
    q, r = divmod(s, 32)
    limbs = []
    for w in range(W):
        lo = _limb(x, w - q)
        if r == 0:
            limbs.append(lo)
        else:
            hi = _limb(x, w - q - 1)
            limbs.append((lo << np.uint32(r)) | (hi >> np.uint32(32 - r)))
    return jnp.stack(limbs, axis=-1)


def mw_shift_right(x, s: int, W_out: int | None = None):
    """x >> s, output with W_out limbs (default: same as input)."""
    W = x.shape[-1] if W_out is None else W_out
    q, r = divmod(s, 32)
    limbs = []
    for w in range(W):
        lo = _limb(x, w + q)
        if r == 0:
            limbs.append(lo)
        else:
            hi = _limb(x, w + q + 1)
            limbs.append((lo >> np.uint32(r)) | (hi << np.uint32(32 - r)))
    return jnp.stack(limbs, axis=-1)


def mw_or(a, b):
    W = max(a.shape[-1], b.shape[-1])
    return jnp.stack(
        [_limb(a, w) | _limb(b, w) for w in range(W)], axis=-1
    )


def mw_and_mask_top(x, bits: int):
    """Clear all bits >= `bits` (clean_msw analogue, mer_dna.hpp:523)."""
    W = x.shape[-1]
    limbs = []
    for w in range(W):
        lo_bit = 32 * w
        if lo_bit + 32 <= bits:
            limbs.append(x[..., w])
        elif lo_bit >= bits:
            limbs.append(jnp.zeros_like(x[..., w]))
        else:
            m = np.uint32((1 << (bits - lo_bit)) - 1)
            limbs.append(x[..., w] & m)
    return jnp.stack(limbs, axis=-1)


def mw_less(a, b):
    """a < b as unsigned big integers. Returns bool array."""
    W = a.shape[-1]
    lt = jnp.zeros(a.shape[:-1], dtype=bool)
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for w in range(W - 1, -1, -1):
        lt = lt | (eq & (a[..., w] < b[..., w]))
        eq = eq & (a[..., w] == b[..., w])
    return lt


def mw_eq(a, b):
    W = a.shape[-1]
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for w in range(W):
        eq = eq & (a[..., w] == b[..., w])
    return eq


def mw_select(pred, a, b):
    """where(pred, a, b) broadcasting pred over the limb axis."""
    return jnp.where(pred[..., None], a, b)


def mw_min(a, b):
    return mw_select(mw_less(a, b), a, b)


def to_ints(x) -> np.ndarray:
    """[N, W] uint32 device/np array -> python-int np.object array (host)."""
    x = np.asarray(x, dtype=np.uint64)
    out = np.zeros(x.shape[:-1], dtype=object)
    for w in range(x.shape[-1]):
        out |= x[..., w].astype(object) << (32 * w)
    return out


def from_ints(vals, W: int) -> np.ndarray:
    """Iterable of python ints -> [N, W] uint32 (host)."""
    vals = list(vals)
    out = np.zeros((len(vals), W), dtype=np.uint32)
    for i, v in enumerate(vals):
        v = int(v)
        for w in range(W):
            out[i, w] = (v >> (32 * w)) & 0xFFFFFFFF
    return out
