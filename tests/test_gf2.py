"""GF(2) matrix: rank/inverse/times identities (mirrors the reference's
unit_tests/test_rectangular_binary_matrix.cc property style)."""

import numpy as np
import pytest

from jellyfish_tpu.gf2 import GF2Matrix


@pytest.mark.parametrize("r,c", [(8, 16), (20, 42), (30, 48), (55, 64), (40, 100), (64, 200)])
def test_pseudo_inverse_roundtrip(rng, r, c):
    m = GF2Matrix.random_invertible(r, c, rng)
    inv = m.pseudo_inverse()
    for _ in range(50):
        key = int(rng.integers(0, 1 << 62)) | (int(rng.integers(0, 1 << 62)) << 62)
        key &= (1 << c) - 1
        h = m.times_full(key)
        # high bits pass through
        assert h >> r == key >> r
        # inverse recovers the key: low r bits via inv, high bits identity
        low = inv.times(h)
        assert ((h >> r << r) | low) == key


def test_identity(rng):
    m = GF2Matrix.identity(40)
    assert m.times(12345678) == 12345678
    assert m.pseudo_inverse() is m
    assert m.pseudo_rank() == 40


def test_low_identity_times():
    m = GF2Matrix.low_identity(10, 30)
    for key in [0, 1, (1 << 30) - 1, 0x2AAAAAAA]:
        assert m.times(key) == key & ((1 << 10) - 1)


def test_rank_full(rng):
    m = GF2Matrix.random_invertible(16, 40, rng)
    assert m.pseudo_rank() == 40


def test_singular_detected():
    cols = np.zeros(20, dtype=np.uint64)  # zero matrix is singular
    m = GF2Matrix(10, 20, cols)
    with pytest.raises(np.linalg.LinAlgError):
        m.pseudo_inverse()
    assert m.pseudo_rank() < 20


def test_pseudo_multiplication_identity(rng):
    """m * m^-1 should be the (low) identity on the completion."""
    m = GF2Matrix.random_invertible(12, 36, rng)
    inv = m.pseudo_inverse()
    prod = m.pseudo_multiplication(inv)
    for _ in range(20):
        key = int(rng.integers(0, (1 << 36) - 1))
        assert prod.times_full(key) == key


def test_json_roundtrip(rng):
    m = GF2Matrix.random_invertible(22, 42, rng)
    m2 = GF2Matrix.from_json(m.to_json())
    assert m == m2
    i = GF2Matrix.identity(42)
    assert GF2Matrix.from_json(i.to_json()).is_low_identity()


def test_bit_matrix_matches_times(rng):
    m = GF2Matrix.random_invertible(20, 42, rng)
    A = m.bit_matrix()
    for _ in range(20):
        key = int(rng.integers(0, (1 << 42) - 1))
        bits = np.array([(key >> i) & 1 for i in range(42)], dtype=np.uint8)
        pos_bits = bits @ A % 2
        pos = int(sum(int(b) << j for j, b in enumerate(pos_bits)))
        assert pos == m.times(key)
