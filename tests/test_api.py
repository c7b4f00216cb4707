"""SWIG-parity scripting API tests, mirroring the reference binding tests
(swig/python/test_mer_file.py, test_hash_counter.py, test_string_mers.py):
bindings are cross-checked against dump/histo of the same database."""

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna


def test_merdna_global_k():
    import jellyfish_tpu as jellyfish

    jellyfish.MerDNA.k(21)
    assert jellyfish.MerDNA.k() == 21
    m = jellyfish.MerDNA()
    assert m.k == 21 and str(m) == "A" * 21
    m2 = jellyfish.MerDNA("ACGTACGTACGTACGTACGTA")
    assert m2.k == 21


def test_hash_counter():
    import jellyfish_tpu as jellyfish

    jellyfish.MerDNA.k(11)
    h = jellyfish.HashCounter(1024, 5)
    assert h.size() == 1024 and h.val_len() == 5
    m = jellyfish.MerDNA("ACGTACGTACG")
    assert h.get(m) is None
    assert h[m] is None
    assert not h.update_add(m, 3)  # absent: no-op
    assert h.get(m) is None
    h.add(m, 2)
    assert h.get(m) == 2
    assert h.update_add(m, 3)
    assert h[m] == 5


def test_hash_set():
    import jellyfish_tpu as jellyfish

    jellyfish.MerDNA.k(9)
    s = jellyfish.HashSet(256)
    m = jellyfish.MerDNA("ACGTACGTA")
    assert not s.get(m)
    s.add(m)
    assert s[m]


def test_read_and_query_mer_file(tmp_path, rng):
    import jellyfish_tpu as jellyfish
    from jellyfish_tpu.cli import main as cli_main

    fa = str(tmp_path / "s.fa")
    seqs = [random_dna(rng, 500) for _ in range(4)]
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")
    db = str(tmp_path / "s.jf")
    cli_main(["count", "-m", "17", "-s", "10k", "-C", "-o", db, fa])

    expected = oracle_counts(seqs, 17, True)

    rd = jellyfish.ReadMerFile(db)
    got = {}
    for mer, count in rd:
        got[mer.bits] = count
    assert got == expected

    q = jellyfish.QueryMerFile(db)
    items = list(expected.items())[:50]
    for bits, c in items:
        m = jellyfish.MerDNA(17, bits)
        if q.canonical:
            m.canonicalize()
        assert q[m] == c

    # explicit next_mer()/mer()/count() protocol
    rd2 = jellyfish.ReadMerFile(db)
    assert rd2.next_mer()
    assert rd2.count() == expected[rd2.mer().bits]


def test_string_mers_api(rng):
    import jellyfish_tpu as jellyfish

    s = random_dna(rng, 200, with_n=True)
    k = 13
    mers = list(jellyfish.string_mers(s, k))
    cans = list(jellyfish.string_canonicals(s, k))
    assert len(mers) == len(cans)
    for m, c in zip(mers, cans):
        assert m.get_canonical() == c


def test_string_mers_global_k_default(rng):
    """SWIG parity: string_mers(str) with no k uses the global
    MerDNA.k() (swig/string_mers.i)."""
    import jellyfish_tpu as jellyfish

    s = random_dna(rng, 100)
    jellyfish.MerDNA.k(17)
    assert (list(jellyfish.string_mers(s))
            == list(jellyfish.string_mers(s, 17)))
    assert (list(jellyfish.string_canonicals(s))
            == list(jellyfish.string_canonicals(s, 17)))
