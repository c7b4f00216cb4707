"""Device mer extraction vs. the MerDNA host oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from jellyfish_tpu.mer import MerDNA, string_canonicals, string_mers
from jellyfish_tpu.ops import multiword as mw
from jellyfish_tpu.ops.mers import encode_codes, extract_mers, reverse_complement
from tests.conftest import random_dna


def test_mer_dna_string_roundtrip():
    m = MerDNA("ACGTTGCA")
    assert str(m) == "ACGTTGCA"
    assert m.bits == 0b0001101111100100


def test_mer_dna_revcomp():
    m = MerDNA("ACGTA")
    assert str(m.get_reverse_complement()) == "TACGT"
    m = MerDNA("AAAAC")
    assert str(m.get_reverse_complement()) == "GTTTT"
    # involution
    assert m.get_reverse_complement().get_reverse_complement() == m


def test_mer_dna_shifts():
    m = MerDNA("ACGTA")
    out = m.shift_left("C")
    assert out == "A" and str(m) == "CGTAC"
    out = m.shift_right("G")
    assert out == "C" and str(m) == "GCGTA"


def test_mer_dna_canonical():
    m = MerDNA("TTTTT")
    assert str(m.get_canonical()) == "AAAAA"
    m = MerDNA("ACGT")  # palindrome
    assert m.get_canonical() == m


@pytest.mark.parametrize("k", [5, 16, 21, 31, 32, 33, 48, 64, 100])
def test_extract_matches_oracle(rng, k):
    seq = random_dna(rng, 400, with_n=True, n_prob=0.05)
    codes = encode_codes(jnp.asarray(np.frombuffer(seq.encode(), dtype=np.uint8)))
    mers, valid = extract_mers(codes, k, canonical=False)
    mers = np.asarray(mers)
    valid = np.asarray(valid)

    oracle = {}
    for i in range(len(seq) - k + 1):
        window = seq[i : i + k]
        if all(ch in "ACGT" for ch in window):
            oracle[i] = MerDNA(window).bits

    got = {i: int(v) for i, v in enumerate(mw.to_ints(mers)) if valid[i]}
    assert got == oracle


@pytest.mark.parametrize("k", [7, 21, 33, 64])
def test_device_revcomp_matches_oracle(rng, k):
    seq = random_dna(rng, 200)
    codes = encode_codes(jnp.asarray(np.frombuffer(seq.encode(), dtype=np.uint8)))
    mers, valid = extract_mers(codes, k, canonical=False)
    rc = np.asarray(reverse_complement(jnp.asarray(mers), k))
    vals = mw.to_ints(rc)
    for i in range(len(seq) - k + 1):
        expect = MerDNA(seq[i : i + k]).get_reverse_complement().bits
        assert int(vals[i]) == expect


@pytest.mark.parametrize("k", [9, 21, 33])
def test_device_canonical_matches_oracle(rng, k):
    seq = random_dna(rng, 300, with_n=True)
    codes = encode_codes(jnp.asarray(np.frombuffer(seq.encode(), dtype=np.uint8)))
    mers, valid = extract_mers(codes, k, canonical=True)
    valid = np.asarray(valid)
    vals = mw.to_ints(np.asarray(mers))
    for i in range(len(seq) - k + 1):
        window = seq[i : i + k]
        if all(ch in "ACGT" for ch in window):
            assert valid[i]
            assert int(vals[i]) == MerDNA(window).get_canonical().bits
        else:
            assert not valid[i]


def test_string_mers_helper():
    mers = [str(m) for m in string_mers("ACGNTAG", 2)]
    assert mers == ["AC", "CG", "TA", "AG"]
    cans = [str(m) for m in string_canonicals("ACGNTAG", 2)]
    assert cans == ["AC", "CG", "TA", "AG"]
