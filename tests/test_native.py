"""Native C++ chunker parity vs the pure-python reference implementation."""

import os

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna


def _write_fasta(path, seqs, line_len=60, dos=False):
    eol = "\r\n" if dos else "\n"
    with open(path, "w", newline="") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}{eol}")
            for j in range(0, len(s), line_len):
                f.write(s[j : j + line_len] + eol)


def _write_fastq(path, seqs, quals):
    with open(path, "w") as f:
        for i, (s, q) in enumerate(zip(seqs, quals)):
            f.write(f"@r{i}\n{s}\n+\n{q}\n")


def _count(paths, k, chunk_len, min_qual=None, canonical=False):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.io.parse import SequenceChunker

    c = MerCounter(k, size=1 << 12, canonical=canonical,
                   rng=np.random.default_rng(1))
    ch = SequenceChunker(paths, k, chunk_len, min_qual=min_qual)
    for chunk in ch.chunks():
        c.add_chunk(chunk)
    mers, counts = c.finalize()
    return {int(m): int(v) for m, v in zip(mers, counts)}, ch.reads


@pytest.fixture
def native_available():
    from jellyfish_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native chunker not available")


def _both_paths(paths, k, chunk_len, **kw):
    assert not os.environ.get("JF_NO_NATIVE")
    native, nreads = _count(paths, k, chunk_len, **kw)
    os.environ["JF_NO_NATIVE"] = "1"
    try:
        py, preads = _count(paths, k, chunk_len, **kw)
    finally:
        del os.environ["JF_NO_NATIVE"]
    return native, py, nreads, preads


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
def test_fuzz_structured_parity(tmp_path, rng, native_available, seed):
    """Seeded structural fuzz: random record shapes, empty sequences,
    stray blank lines, mixed DOS endings, ragged quality strings padded
    to length, lowercase and ambiguity codes — the native FSM and the
    python parser must agree mer-for-mer (the sanitizer/fuzz tier the
    reference covers with valgrind-wrapped stress, compat.sh.in:7)."""
    frng = np.random.default_rng(seed)
    alpha = np.array(list("ACGTNacgtnRYKM"), dtype="U1")

    def rand_seq(n):
        return "".join(frng.choice(alpha, size=n))

    fa = tmp_path / "fuzz.fa"
    eols = ["\n", "\r\n"]
    with open(fa, "w", newline="") as f:
        for i in range(int(frng.integers(3, 12))):
            eol = eols[int(frng.integers(0, 2))]
            f.write(f">rec{i} desc{eol}")
            n = int(frng.integers(0, 300))
            line_len = int(frng.integers(1, 80))
            s = rand_seq(n)
            for j in range(0, len(s), line_len):
                f.write(s[j : j + line_len] + eol)
            if frng.random() < 0.3:
                f.write(eol)  # stray blank line between records

    fq = tmp_path / "fuzz.fq"
    with open(fq, "w") as f:
        for i in range(int(frng.integers(3, 10))):
            n = int(frng.integers(0, 150))
            s = rand_seq(n)
            q = "".join(
                chr(int(x)) for x in frng.integers(33, 74, size=n)
            )
            f.write(f"@r{i}\n{s}\n+\n{q}\n")

    k = int(frng.integers(3, 32))
    chunk_len = int(frng.integers(64, 4096))
    for paths, kw in (
        ([str(fa)], {}),
        ([str(fq)], {}),
        ([str(fq)], {"min_qual": 40}),
        ([str(fa), str(fq)], {}),
    ):
        native, py, nreads, preads = _both_paths(paths, k, chunk_len, **kw)
        assert native == py, (paths, kw, k, chunk_len)
        assert nreads == preads


def test_fasta_parity(tmp_path, rng, native_available):
    seqs = [random_dna(rng, n, with_n=True) for n in (37, 200, 61, 1000, 5)]
    fa = str(tmp_path / "a.fa")
    _write_fasta(fa, seqs)
    for chunk_len in (64, 256, 4096):
        native, py, nreads, preads = _both_paths([fa], 21, chunk_len)
        assert native == py
        assert nreads == preads == len(seqs)
        assert native == oracle_counts(seqs, 21, False)


def test_fasta_dos_endings(tmp_path, rng, native_available):
    seqs = [random_dna(rng, 300) for _ in range(3)]
    fa = str(tmp_path / "dos.fa")
    _write_fasta(fa, seqs, line_len=50, dos=True)
    native, py, *_ = _both_paths([fa], 15, 128)
    assert native == py == oracle_counts(seqs, 15, False)


def test_fastq_parity(tmp_path, rng, native_available):
    seqs = [random_dna(rng, n) for n in (80, 150, 33)]
    quals = ["".join(chr(int(x)) for x in rng.integers(66, 107, len(s)))
             for s in seqs]
    fq = str(tmp_path / "a.fq")
    _write_fastq(fq, seqs, quals)
    native, py, *_ = _both_paths([fq], 13, 256)
    assert native == py == oracle_counts(seqs, 13, False)


def test_fastq_quality_mask_parity(tmp_path, rng, native_available):
    seqs = [random_dna(rng, 200) for _ in range(4)]
    quals = ["".join(chr(int(x)) for x in rng.integers(66, 107, len(s)))
             for s in seqs]
    fq = str(tmp_path / "q.fq")
    _write_fastq(fq, seqs, quals)
    thresh = 80
    native, py, *_ = _both_paths([fq], 11, 256, min_qual=thresh)
    masked = [
        "".join(b if ord(q) >= thresh else "N" for b, q in zip(s, qs))
        for s, qs in zip(seqs, quals)
    ]
    assert native == py == oracle_counts(masked, 11, False)


def test_multi_file_parity(tmp_path, rng, native_available):
    seqs1 = [random_dna(rng, 120) for _ in range(3)]
    seqs2 = [random_dna(rng, 90) for _ in range(2)]
    fa1, fa2 = str(tmp_path / "1.fa"), str(tmp_path / "2.fa")
    _write_fasta(fa1, seqs1)
    _write_fasta(fa2, seqs2)
    native, py, *_ = _both_paths([fa1, fa2], 17, 100)
    assert native == py == oracle_counts(seqs1 + seqs2, 17, False)
