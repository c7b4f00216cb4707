"""SAM input support (reference: --sam via sam_format.hpp; tests/sam.sh
compares SAM-derived counts to the FASTQ they came from)."""

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna


def _write_sam(path, seqs, quals=None):
    with open(path, "w") as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        f.write("@SQ\tSN:ref\tLN:10000\n")
        for i, s in enumerate(seqs):
            q = quals[i] if quals else "*"
            f.write(f"r{i}\t4\t*\t0\t0\t*\t*\t0\t0\t{s}\t{q}\n")
        # records that must be skipped
        f.write("empty\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")


def _count_sam(sam, k, min_qual=None, chunk_len=512):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.io.parse import SequenceChunker

    c = MerCounter(k, size=1 << 12, rng=np.random.default_rng(1))
    ch = SequenceChunker([], k, chunk_len, min_qual=min_qual, sam_paths=[sam])
    for chunk in ch.chunks():
        c.add_chunk(chunk)
    mers, counts = c.finalize()
    return {int(m): int(v) for m, v in zip(mers, counts)}


def test_sam_counts_match_fasta_oracle(tmp_path, rng):
    seqs = [random_dna(rng, n) for n in (150, 80, 321)]
    sam = str(tmp_path / "a.sam")
    _write_sam(sam, seqs)
    assert _count_sam(sam, 15) == oracle_counts(seqs, 15, False)


def test_sam_quality_masking(tmp_path, rng):
    seqs = [random_dna(rng, 120) for _ in range(3)]
    quals = ["".join(chr(int(x)) for x in rng.integers(66, 107, len(s)))
             for s in seqs]
    sam = str(tmp_path / "q.sam")
    _write_sam(sam, seqs, quals)
    thresh = 85
    masked = ["".join(b if ord(q) >= thresh else "N" for b, q in zip(s, qs))
              for s, qs in zip(seqs, quals)]
    assert _count_sam(sam, 11, min_qual=thresh) == oracle_counts(masked, 11, False)


def _bgzf_block(data: bytes) -> bytes:
    """One conformant BGZF block (gzip member with the BC extra field)."""
    import struct
    import zlib

    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    payload = co.compress(data) + co.flush()
    total = 18 + len(payload) + 8  # header + deflate payload + crc/isize
    head = (b"\x1f\x8b\x08\x04" + b"\x00" * 4 + b"\x00\xff"
            + struct.pack("<H", 6) + b"BC"
            + struct.pack("<HH", 2, total - 1))  # BSIZE = total - 1
    return (head + payload
            + struct.pack("<II", zlib.crc32(data), len(data) & 0xFFFFFFFF))


_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _write_bam(path, seqs, quals=None):
    """Minimal spec-conformant BAM: header + one record per sequence.
    quals[i] is a list of raw phred ints or None (0xFF fill -> no qual)."""
    import struct

    nib = {b: i for i, b in enumerate("=ACMGRSVTWYHKDBN")}
    body = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 1)
    body += struct.pack("<i", 4) + b"ref\x00" + struct.pack("<i", 10000)
    for i, s in enumerate(seqs):
        name = f"r{i}".encode() + b"\x00"
        packed = bytearray((len(s) + 1) // 2)
        for j, base in enumerate(s):
            v = nib.get(base, 15)
            packed[j // 2] |= v << 4 if j % 2 == 0 else v
        q = bytes(quals[i]) if quals and quals[i] is not None \
            else b"\xff" * len(s)
        rec = struct.pack(
            "<iiBBHHHiiii", -1, -1, len(name), 0, 0, 0, 4, len(s), -1, -1, 0
        ) + name + bytes(packed) + q
        body += struct.pack("<i", len(rec)) + rec
    with open(path, "wb") as f:
        # BGZF members are capped at 64 KiB (BSIZE is u16); chunk like
        # htslib does — also exercises multi-member gzip + EOF marker
        step = max(len(body) // 2 + 1, 1) if len(body) < 60000 else 60000
        for off in range(0, len(body), step):
            f.write(_bgzf_block(body[off:off + step]))
        f.write(_BGZF_EOF)


def test_bam_counts_match_fasta_oracle(tmp_path, rng):
    seqs = [random_dna(rng, n, with_n=True) for n in (150, 80, 321, 33)]
    bam = str(tmp_path / "a.bam")
    _write_bam(bam, seqs)
    assert _count_sam(bam, 15) == oracle_counts(seqs, 15, False)


def test_bam_quality_masking(tmp_path, rng):
    seqs = [random_dna(rng, 120) for _ in range(3)]
    quals = [[int(x) for x in rng.integers(2, 60, len(s))] for s in seqs]
    bam = str(tmp_path / "q.bam")
    _write_bam(bam, seqs, quals)
    thresh = 30 + 33  # min_qual compares phred+33 text encoding
    masked = ["".join(b if q + 33 >= thresh else "N"
                      for b, q in zip(s, qs))
              for s, qs in zip(seqs, quals)]
    assert _count_sam(bam, 11, min_qual=thresh) == oracle_counts(
        masked, 11, False
    )


def test_cram_unsupported_version_hint(tmp_path):
    # CRAM 3.x is decoded natively (tests/test_cram.py); other versions
    # get a clear re-encode hint
    from jellyfish_tpu.io.parse import sam_records_to_fastx

    p = tmp_path / "x.cram"
    p.write_bytes(b"CRAM" + b"\x00" * 32)
    with pytest.raises(ValueError, match="version 0.0 not supported"):
        list(sam_records_to_fastx(open(p, "rb")))


def test_bam_window_carry_over_4mb(tmp_path, rng):
    """The native BAM parser processes 4 MB windows and carries partial
    records between them — a >4 MB BAM with record boundaries straddling
    window edges must decode identically to the python loop."""
    import os

    from jellyfish_tpu.io.parse import open_stream, sam_records_to_fastx

    # ~6 MB decompressed: 12k records of ~500 B (odd lengths so
    # boundaries drift across the 1<<22 window edge)
    seqs = [random_dna(rng, int(n)) for n in rng.integers(301, 500, 12000)]
    bam = str(tmp_path / "big.bam")
    _write_bam(bam, seqs)
    native = b"".join(sam_records_to_fastx(open_stream(bam)))
    os.environ["JF_NO_NATIVE"] = "1"
    try:
        python = b"".join(sam_records_to_fastx(open_stream(bam)))
    finally:
        del os.environ["JF_NO_NATIVE"]
    assert native == python
    assert native.count(b">") == len(seqs)


def test_bam_native_matches_python(tmp_path, rng):
    """jf_bam_records (native window parser) and the python per-record
    loop emit identical bytes, mixed FASTA/FASTQ records."""
    import os

    from jellyfish_tpu.io.parse import open_stream, sam_records_to_fastx

    seqs = [random_dna(rng, int(n), with_n=True)
            for n in rng.integers(10, 300, 25)]
    quals = [None if i % 3 == 0 else
             [int(x) for x in rng.integers(0, 90, len(s))]
             for i, s in enumerate(seqs)]
    bam = str(tmp_path / "mix.bam")
    _write_bam(bam, seqs, quals)
    native = b"".join(sam_records_to_fastx(open_stream(bam)))
    os.environ["JF_NO_NATIVE"] = "1"
    try:
        python = b"".join(sam_records_to_fastx(open_stream(bam)))
    finally:
        del os.environ["JF_NO_NATIVE"]
    assert native == python
    assert native.count(b"\n") >= len(seqs) * 2
