"""BitsArray (atomic_bits_array analogue) vs a sequential python oracle.

The reference tests atomic_bits_array by racing threads and checking the
final field values (unit_tests/test_atomic_bits_array.cc); here the
batched device semantics must equal sequential application of the batch:
last-wins for set, order-free fold for or/max, packed layout with entries
never straddling words (atomic_bits_array.hpp:83-97 layout).
"""

import numpy as np
import pytest

from jellyfish_tpu.ops.bitsarray import BitsArray


@pytest.mark.parametrize("bits", [1, 2, 3, 5, 8, 16, 32])
@pytest.mark.parametrize("op", ["set", "or", "max"])
def test_batched_matches_sequential(bits, op):
    rng = np.random.default_rng(1000 * bits + len(op))
    size = 257
    a = BitsArray(bits, size)
    mask = (1 << bits) - 1
    oracle = np.zeros(size, dtype=np.uint64)
    for _ in range(3):
        n = int(rng.integers(1, 400))
        ids = rng.integers(0, size + 13, size=n).astype(np.uint32)
        vals = rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
        getattr(a, {"set": "set", "or": "fetch_or", "max": "fetch_max"}[op])(
            ids, vals.astype(np.uint32)
        )
        for i, v in zip(ids, vals):
            if i >= size:
                continue
            v &= mask
            if op == "set":
                oracle[i] = v
            elif op == "or":
                oracle[i] |= v
            else:
                oracle[i] = max(oracle[i], v)
    assert np.array_equal(a.values(), oracle.astype(np.uint32))
    # point reads agree
    probe = rng.integers(0, size, size=32).astype(np.uint32)
    assert np.array_equal(a.get(probe), oracle[probe].astype(np.uint32))


def test_layout_no_straddle_and_roundtrip():
    # bits=3: 10 entries/word, 2 slack bits — floor layout like the
    # reference's divisor64(w/bits)
    a = BitsArray(3, 25)
    assert a.entries_per_word == 10
    assert a.data.shape[0] == 3
    a.set(np.arange(25, dtype=np.uint32),
          (np.arange(25, dtype=np.uint32) % 8))
    raw = a.to_bytes()
    b = BitsArray.from_bytes(3, 25, raw)
    assert np.array_equal(b.values(), np.arange(25) % 8)
    assert b[24] == 24 % 8


def test_set_last_wins_in_batch_order():
    a = BitsArray(8, 16)
    ids = np.array([3, 3, 3, 5, 5, 3], dtype=np.uint32)
    vals = np.array([1, 2, 3, 9, 7, 42], dtype=np.uint32)
    a.set(ids, vals)
    assert a[3] == 42 and a[5] == 7
