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


def test_bam_rejected_with_hint(tmp_path):
    from jellyfish_tpu.io.parse import sam_records_to_fastx

    p = tmp_path / "x.bam"
    p.write_bytes(b"BAM\x01" + b"\x00" * 32)
    with pytest.raises(ValueError, match="samtools view"):
        list(sam_records_to_fastx(open(p, "rb")))
