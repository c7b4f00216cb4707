"""Edge k coverage mirroring the reference's shell tiers:
large_key.sh (k=100 multi-word), small_mers.sh (k=2..10, counter widths),
parallel_hashing.sh (k=40)."""

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna


def _count(seqs, k, size, canonical=False, chunk_len=2048):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.io.parse import SequenceChunker

    c = MerCounter(k, size=size, canonical=canonical,
                   rng=np.random.default_rng(5))
    buf = np.full(chunk_len, ord("N"), dtype=np.uint8)
    # simple single-read-per-chunk packing (tests only)
    for s in seqs:
        b = np.frombuffer(s.encode(), dtype=np.uint8)
        assert len(b) <= chunk_len
        chunk = buf.copy()
        chunk[: len(b)] = b
        c.add_chunk(chunk)
    mers, counts = c.finalize()
    return {int(m): int(v) for m, v in zip(mers, counts)}


@pytest.mark.parametrize("k", [40, 64, 100])
def test_large_k_multiword(rng, k):
    """k=100 -> 200-bit keys over 7 limbs (large_key.sh k=100)."""
    seqs = [random_dna(rng, 500) for _ in range(4)] * 2  # duplicates
    got = _count(seqs, k, size=1 << 12, canonical=True)
    assert got == oracle_counts(seqs, k, True)


@pytest.mark.parametrize("k", [2, 3, 5, 10])
def test_small_mers(rng, k):
    """k=2..10 (small_mers.sh); size >= 4^k triggers the identity matrix."""
    seqs = [random_dna(rng, 300, with_n=True) for _ in range(3)]
    got_small = _count(seqs, k, size=1 << 5)
    got_ident = _count(seqs, k, size=4 ** k)
    expected = oracle_counts(seqs, k, False)
    assert got_small == expected
    assert got_ident == expected


def test_k16_k32_limb_boundary(rng):
    """2k % 32 == 0 (all-ones PAD ambiguity path) must stay exact,
    including a poly-T read whose canonical sortkey region is extremal."""
    for k in (16, 32):
        seqs = [random_dna(rng, 200), "T" * 80, random_dna(rng, 64)]
        got = _count(seqs, k, size=1 << 10, canonical=False)
        assert got == oracle_counts(seqs, k, False)


def test_identity_matrix_polyT_all_ones(rng):
    """With the identity matrix, poly-T mers ARE the all-ones sortkey:
    the PAD-correction path must not eat them (k=8, size=4^8)."""
    k = 8
    seqs = ["T" * 64, random_dna(rng, 100)]
    got = _count(seqs, k, size=4 ** k)
    expected = oracle_counts(seqs, k, False)
    assert got == expected
    assert got[(1 << (2 * k)) - 1] == expected[(1 << (2 * k)) - 1]


def test_counter_width_agreement(tmp_path, rng):
    """Counter width / out-counter-len agreement (small_mers.sh checks
    -c 25 vs -c 5 agree; here out-counter saturation semantics)."""
    from jellyfish_tpu.cli import main as cli

    fa = str(tmp_path / "x.fa")
    with open(fa, "w") as f:
        f.write(">r\n" + "A" * 300 + "\n")  # poly-A: one mer, count 294
    db1 = str(tmp_path / "c1.jf")
    db4 = str(tmp_path / "c4.jf")
    cli(["count", "-m", "7", "-s", "1k", "--out-counter-len", "1",
         "-o", db1, fa])
    cli(["count", "-m", "7", "-s", "1k", "--out-counter-len", "4",
         "-o", db4, fa])
    from jellyfish_tpu.io.files import DBReader

    with DBReader(db4) as r:
        recs4 = dict(iter(r))
    with DBReader(db1) as r:
        recs1 = dict(iter(r))
    polyA = 0
    assert recs4[polyA] == 294
    assert recs1[polyA] == 255  # saturated at 1-byte max (binary_dumper.hpp:36-40)
