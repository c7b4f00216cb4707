"""Bit-packed resting runs (ops/packed_run.py): exact roundtrip incl.
count escapes, 64-bit counts, the genuine all-ones key, and the ~3x
capacity model (VERDICT r3 #9 / reference offsets_key_value.hpp)."""
import numpy as np
import jax.numpy as jnp

from jellyfish_tpu.ops.packed_run import pack_run, unpack_run, packed_nbytes


def test_roundtrip_w2_escapes(rng):
    key_bits, W = 42, 2
    n, M = 40000, 65536
    vals = np.sort(rng.choice(1 << key_bits, size=n, replace=False).astype(np.uint64))
    keys = np.full((M, W), 0xFFFFFFFF, dtype=np.uint32)
    keys[:n, 0] = (vals & 0xFFFFFFFF).astype(np.uint32)
    keys[:n, 1] = (vals >> 32).astype(np.uint32)
    lo = np.zeros(M, dtype=np.uint32)
    lo[:n] = rng.geometric(0.2, size=n).astype(np.uint32)
    lo[5] = 1 << 20       # escape
    lo[77] = 126          # boundary below escape
    lo[78] = 127          # at sentinel -> escapes
    hi = np.zeros(M, dtype=np.uint32)
    hi[9] = 3             # 64-bit count escape
    lo[9] = 12345

    pr = pack_run(jnp.asarray(keys), jnp.asarray(lo), jnp.asarray(hi), n, key_bits)
    k2, l2, h2 = unpack_run(pr)
    np.testing.assert_array_equal(np.asarray(k2), keys[:n])
    np.testing.assert_array_equal(np.asarray(l2), lo[:n])
    np.testing.assert_array_equal(np.asarray(h2), hi[:n])
    dense = n * (W + 2) * 4
    print(f"roundtrip OK; packed {pr.device_bytes()} B vs dense {dense} B "
          f"({dense/pr.device_bytes():.2f}x), model {packed_nbytes(n, key_bits)} B")
