"""Packed-ingest path parity: host 2-bit packing + device packed pipeline
must count identically to the ASCII path."""

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna


def _chunk_of(seq: str, L: int) -> np.ndarray:
    chunk = np.full(L, ord("N"), dtype=np.uint8)
    b = np.frombuffer(seq.encode(), dtype=np.uint8)
    chunk[: len(b)] = b
    return chunk


def test_pack_chunk_layout(rng):
    """Native packer agrees with the numpy reference packer bit-for-bit."""
    import os

    from jellyfish_tpu.native import pack_chunk

    chunk = _chunk_of("ACGTNacgtRY" + "G" * 21, 64)
    pwords, valid = pack_chunk(chunk)
    assert pwords.shape == (4,) and valid.shape == (2,)
    os.environ["JF_NO_NATIVE"] = "1"
    try:
        p2, v2 = pack_chunk(chunk)
    finally:
        del os.environ["JF_NO_NATIVE"]
    assert np.array_equal(pwords, p2)
    assert np.array_equal(valid, v2)
    # validity bits: ACGT valid, N invalid, acgt valid, R/Y invalid
    bits = [(int(valid[i // 32]) >> (i % 32)) & 1 for i in range(11)]
    assert bits == [1, 1, 1, 1, 0, 1, 1, 1, 1, 0, 0]
    # first packed word: big-endian 2-bit codes of the first 16 bytes
    expect = 0
    for byte in chunk[:16]:
        t = (int(byte) >> 1) & 3
        expect = (expect << 2) | (t ^ (t >> 1))
    assert int(pwords[0]) == expect


@pytest.mark.parametrize("k,canonical", [(13, False), (21, True), (33, True),
                                         (16, False), (100, True)])
def test_packed_counts_match_ascii(rng, k, canonical):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.native import pack_chunk

    L = 1024
    seqs = [random_dna(rng, 800, with_n=True) for _ in range(6)]
    c1 = MerCounter(k, size=1 << 12, canonical=canonical,
                    rng=np.random.default_rng(2))
    c2 = MerCounter(k, size=1 << 12, canonical=canonical,
                    matrix=c1.matrix)
    for s in seqs:
        chunk = _chunk_of(s, L)
        c1.add_chunk(chunk)
        c2.add_chunk_packed(*pack_chunk(chunk))
    m1, v1 = c1.finalize()
    m2, v2 = c2.finalize()
    d1 = {int(a): int(b) for a, b in zip(m1, v1)}
    d2 = {int(a): int(b) for a, b in zip(m2, v2)}
    assert d1 == d2 == oracle_counts(seqs, k, canonical)


def test_chunks_packed_end_to_end(tmp_path, rng):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.io.parse import SequenceChunker

    seqs = [random_dna(rng, n, with_n=True) for n in (500, 133, 902)]
    fa = tmp_path / "p.fa"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")
    k = 21
    c = MerCounter(k, size=1 << 12, canonical=True,
                   rng=np.random.default_rng(9))
    for pwords, validbits in SequenceChunker([str(fa)], k, 512).chunks_packed():
        c.add_chunk_packed(pwords, validbits)
    mers, counts = c.finalize()
    got = {int(a): int(b) for a, b in zip(mers, counts)}
    assert got == oracle_counts(seqs, k, True)


@pytest.mark.parametrize("k,canonical", [(21, True), (33, True)])
def test_batched_ingest_matches_per_chunk(rng, k, canonical):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.native import pack_chunk

    L = 1024
    seqs = [random_dna(rng, 990, with_n=True) for _ in range(8)]
    c1 = MerCounter(k, size=1 << 12, canonical=canonical,
                    rng=np.random.default_rng(7))
    c2 = MerCounter(k, size=1 << 12, canonical=canonical,
                    matrix=c1.matrix)
    packed = [pack_chunk(_chunk_of(s, L)) for s in seqs]
    for pw, vb in packed:
        c1.add_chunk_packed(pw, vb)
    # batch of 3, 3, 2 — exercises two batch shapes
    for i in (0, 3, 6):
        group = packed[i:i + 3]
        c2.add_chunks_packed_batch(
            np.stack([p for p, _ in group]),
            np.stack([v for _, v in group]),
        )
    m1, v1 = c1.finalize()
    m2, v2 = c2.finalize()
    d1 = {int(a): int(b) for a, b in zip(m1, v1)}
    d2 = {int(a): int(b) for a, b in zip(m2, v2)}
    assert d1 == d2 == oracle_counts(seqs, k, canonical)
