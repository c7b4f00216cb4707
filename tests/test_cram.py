"""CRAM 3.0 reader tests (jellyfish_tpu/io/cram.py + io/rans.py).

The image has no htslib/samtools/pysam, so the reader is exercised
against tests/cram_writer.py — an independent encoder written from the
spec text — plus hand-written expected sequences for the feature-coded
(mapped) reconstruction cases. Covers the reference's consumption
surface (sam_format.hpp:22-57: sequences + qualities only).
"""

import io
import os
import random

import pytest

import cram_writer as cw
from cram_writer import (Beta, ByteArrayStop, External, Gamma, Huffman,
                         SubExp, ext_array, simple_cram)
from jellyfish_tpu.io import rans
from jellyfish_tpu.io.cram import CramError, cram_records_to_fastx
from jellyfish_tpu.io.parse import sam_records_to_fastx


def decode(blob: bytes) -> bytes:
    """Concatenated FASTA/FASTQ bytes (chunk boundaries are an
    implementation detail: per-slice native, per-record python)."""
    stream = io.BytesIO(blob)
    assert stream.read(4) == b"CRAM"
    return b"".join(cram_records_to_fastx(stream))


def fastq(name, seq, qual):
    return (b"@" + name + b"\n" + seq + b"\n+\n"
            + bytes(min(q, 93) + 33 for q in qual) + b"\n")


def fasta(name, seq):
    return b">" + name + b"\n" + seq + b"\n"


# ------------------------------------------------------------------ rANS


def test_rans_roundtrip_fuzz():
    rng = random.Random(31415)
    cases = [b"", b"A", b"ACGT" * 64, bytes(range(256)) * 3,
             bytes(rng.choices(b"ACGTN", weights=[9, 8, 7, 2, 1], k=40000)),
             bytes(rng.randrange(256) for _ in range(5000))]
    for order in (0, 1):
        for raw in cases:
            assert rans.decode(rans.encode(raw, order)) == raw


def test_rans_rejects_bad_order():
    import struct
    with pytest.raises(ValueError, match="order"):
        rans.decode(b"\x02" + struct.pack("<II", 1, 4) + b"x")


# ------------------------------------------------- unmapped round trips


RECORDS = [
    {"name": b"r1", "seq": b"ACGTACGTACGTACGTACGT",
     "qual": bytes([37] * 20)},
    {"name": b"r2", "seq": b"GGGGCCCCNNTTTTAAAA", "qual": None},
    {"name": b"r3", "seq": b"ACACACACACACACACACACACACAC",
     "qual": bytes(range(26))},
]

EXPECT = [
    fastq(b"r1", b"ACGTACGTACGTACGTACGT", bytes([37] * 20)),
    fasta(b"r2", b"GGGGCCCCNNTTTTAAAA"),
    fastq(b"r3", b"ACACACACACACACACACACACACAC", bytes(range(26))),
]


def test_unmapped_roundtrip_plain():
    assert decode(simple_cram(RECORDS)) == b"".join(EXPECT)


@pytest.mark.parametrize("method",
                         ["gzip", "bzip2", "lzma", "rans0", "rans1"])
def test_block_compression_methods(method):
    # compress every block: externals, core, and the SAM/comp headers
    methods = {cw.CORE: method, "slice_header": method}
    for cid in range(1, 30):
        methods[cid] = method
    series = cw.default_series()
    sl = cw.encode_slice(series, RECORDS, block_methods=methods)
    comp = cw.compression_header(series)
    blob = (cw.file_definition()
            + cw.sam_header_container(b"@HD\tVN:1.6\n", method=method)
            + cw.data_container(comp, sl, 1 + cw.count_blocks(sl),
                                len(RECORDS), 0, comp_method=method)
            + cw.eof_container())
    assert decode(blob) == b"".join(EXPECT)


def test_core_bit_codecs():
    """HUFFMAN (real 2-symbol code), BETA, GAMMA, SUBEXP in the core
    block; BYTE_ARRAY_STOP names; constant HUFFMAN for flags."""
    series = cw.default_series()
    series["BF"] = Huffman([4], [0])            # constant, 0 bits
    series["CF"] = Huffman([1, 0], [1, 1])      # real 1-bit alphabet
    series["RL"] = Beta(0, 6)                   # lengths < 64
    series["AP"] = Gamma(1)                     # deltas >= 0
    series["RG"] = SubExp(1, 2)                 # -1 -> 0
    series["TL"] = Huffman([0], [0])
    series["RN"] = ByteArrayStop(0x09, 31)
    assert decode(simple_cram(RECORDS, series=series)) == b"".join(EXPECT)


def test_detached_mate_fields_and_tags():
    tag = (b"XAZ", b"hello-world\x00")
    tag_key = (ord("X") << 16) | (ord("A") << 8) | ord("Z")
    series = cw.default_series(detached=True)
    series["TS"] = SubExp(0, 3)
    blob = simple_cram(
        RECORDS, series=series, detached=True,
        tag_dict=[[], [b"XAZ"]], tags=[tag],
        tag_encodings={tag_key: ext_array(40)})
    assert decode(blob) == b"".join(EXPECT)


def test_generated_names_when_rn_not_preserved():
    blob = simple_cram([{"name": b"ignored", "seq": b"ACGT" * 3,
                         "qual": None}], rn_preserved=False)
    rec = decode(blob)
    assert rec == fasta(b"jf.0", b"ACGT" * 3)


# ------------------------------------------------------- mapped records


REF = b"ACGTACGTACGTACGTACGTTTTTGGGGCCCCAAAA"  # 36 bases, 1-based coords


def _mapped_blob(records, rr=True, embedded=None, subst=b"\x1b" * 5,
                 sam_text=b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:36\n",
                 ap_delta=True):
    return simple_cram(records, sam_text=sam_text, ref_id=0, start=1,
                       span=36, rr=rr, embedded_ref=embedded,
                       subst=subst, ap_delta=ap_delta)


def test_mapped_identity_read_embedded_ref():
    # read of length 12 at pos 3 with no features = ref[2:14]
    rec = {"name": b"m1", "mapped": True, "pos": 3, "rlen": 12,
           "features": [], "qual": None}
    out = decode(_mapped_blob([rec], embedded=REF))
    assert out == fasta(b"m1", REF[2:14])


def test_mapped_feature_zoo_embedded_ref():
    """Every feature code; expected sequence hand-derived below.

    REF 0-based: 0..19 = "ACGTACGTACGTACGTACGT", 20..23 = "TTTT",
    24..27 = "GGGG", 28..31 = "CCCC", 32..35 = "AAAA".
    Read aligned at pos 5 (ref_pos starts 0-based 4), length 20.
    """
    features = [
        (1, "S", b"TT"),
        (5, "X", 1),
        (6, "i", ord("G")),
        (7, "B", (ord("T"), 11)),
        (8, "I", b"AA"),
        (10, "D", 2),
        (10, "N", 3),
        (14, "Q", 9),
        (16, "b", b"CA"),
        (18, "q", bytes([7, 8])),
        (20, "H", 5),
        (20, "P", 1),
    ]
    # hand walk (read positions 1-based, ref positions 0-based):
    #  read 1-2:  S -> "TT"; ref stays 4
    #  read 3-4:  match ref 4,5 = "AC"; ref -> 6
    #  read 5:    X on ref 6 'G', code 1; G's candidates are A,C,T,N
    #             so code 1 (identity SM 0x1b) -> 'C'; ref -> 7
    #  read 6:    i -> 'G'; ref stays 7
    #  read 7:    B -> 'T' qual 11; ref -> 8
    #  read 8-9:  I -> "AA"; ref stays 8
    #  D(2): ref 8,9 skipped -> 10;  N(3): ref 10,11,12 skipped -> 13
    #  read 10-13: match ref 13..16 = "CGTA"; ref -> 17
    #  (Q sets qual[13] = 9)
    #  read 14-15: match ref 17,18 = "CG"; ref -> 19
    #  read 16-17: b -> "CA"; ref 19,20 consumed -> 21
    #  (q sets qual[17:19] = 7,8)
    #  read 18-19: match ref 21,22 = "TT"; ref -> 23
    #  (H, P consume nothing)
    #  read 20:   match ref 23 = "T"
    expected_seq = b"TT" + b"AC" + b"C" + b"G" + b"T" + b"AA" \
        + b"CGTA" + b"CG" + b"CA" + b"TT" + b"T"
    assert len(expected_seq) == 20
    expected_qual = bytearray(20)
    expected_qual[6] = 11      # 'B' qual
    expected_qual[13] = 9      # 'Q'
    expected_qual[17:19] = bytes([7, 8])  # 'q'
    rec = {"name": b"zoo", "mapped": True, "pos": 5, "rlen": 20,
           "features": features, "qual": None}
    out = decode(_mapped_blob([rec], embedded=REF))
    assert out == fastq(b"zoo", expected_seq, bytes(expected_qual))


def test_substitution_matrix_nondefault():
    # SM byte 0xE4 reverses the code->candidate order (code 3 -> first)
    rec = {"name": b"s", "mapped": True, "pos": 1, "rlen": 4,
           "features": [(2, "X", 3)], "qual": None}
    # ref[0:4] = ACGT; pos 2 ref 'C' candidates A,G,T,N; with 0xE4 the
    # codes are 3,2,1,0 so code 3 -> 'A'
    out = decode(_mapped_blob([rec], embedded=REF, subst=b"\xe4" * 5))
    assert out == fasta(b"s", b"AAGT")


def test_mapped_qual_array():
    qual = bytes([20] * 8)
    rec = {"name": b"q", "mapped": True, "pos": 1, "rlen": 8,
           "features": [], "qual": qual}
    out = decode(_mapped_blob([rec], embedded=REF))
    assert out == fastq(b"q", REF[:8], qual)


def test_mapped_external_ref_env(tmp_path, monkeypatch):
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_bytes(b">chr1 some description\n" + REF[:18] + b"\n"
                       + REF[18:] + b"\n")
    monkeypatch.setenv("JF_CRAM_REF", str(ref_fa))
    rec = {"name": b"e", "mapped": True, "pos": 7, "rlen": 10,
           "features": [], "qual": None}
    out = decode(_mapped_blob([rec]))
    assert out == fasta(b"e", REF[6:16])


def test_mapped_external_ref_ur_field(tmp_path, monkeypatch):
    monkeypatch.delenv("JF_CRAM_REF", raising=False)
    ref_fa = tmp_path / "ur.fa"
    ref_fa.write_bytes(b">chr1\n" + REF + b"\n")
    sam = (b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:36\tUR:file://"
           + str(ref_fa).encode() + b"\n")
    rec = {"name": b"u", "mapped": True, "pos": 1, "rlen": 36,
           "features": [], "qual": None}
    out = decode(_mapped_blob([rec], sam_text=sam))
    assert out == fasta(b"u", REF)


def test_mapped_missing_ref_raises(monkeypatch):
    monkeypatch.delenv("JF_CRAM_REF", raising=False)
    rec = {"name": b"x", "mapped": True, "pos": 1, "rlen": 4,
           "features": [], "qual": None}
    with pytest.raises(CramError, match="JF_CRAM_REF"):
        decode(_mapped_blob([rec]))


def test_no_ref_cram_rr_false():
    # non-reference CRAM: bases carried whole by 'b' features
    rec = {"name": b"n", "mapped": True, "pos": 1, "rlen": 10,
           "features": [(1, "b", b"TTTTGGGGCC")], "qual": None}
    out = decode(_mapped_blob([rec], rr=False))
    assert out == fasta(b"n", b"TTTTGGGGCC")


def test_ref_padding_past_end():
    # read hangs off the reference end: padded with N
    rec = {"name": b"p", "mapped": True, "pos": 33, "rlen": 8,
           "features": [], "qual": None}
    out = decode(_mapped_blob([rec], embedded=REF))
    assert out == fasta(b"p", b"AAAA" + b"N" * 4)


def test_ap_delta_and_absolute():
    recs = [{"name": b"a", "mapped": True, "pos": 3, "rlen": 4,
             "features": [], "qual": None},
            {"name": b"b", "mapped": True, "pos": 9, "rlen": 4,
             "features": [], "qual": None}]
    for delta in (True, False):
        out = decode(_mapped_blob(recs, embedded=REF, ap_delta=delta))
        assert out == fasta(b"a", REF[2:6]) + fasta(b"b", REF[8:12])


def test_multiref_slice_uses_ri():
    sam = b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:36\n@SQ\tSN:c2\tLN:12\n"
    series = cw.default_series(multiref=True)
    series["FN"] = External(15)
    series["FC"] = External(16)
    series["FP"] = External(17)
    series["MQ"] = External(27)
    recs = [{"name": b"r", "mapped": True, "pos": 1, "rlen": 6,
             "features": [], "qual": None, "ref_id": 1}]
    blob = simple_cram(recs, sam_text=sam, series=series, multiref=True,
                       start=1, span=12)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".fa", delete=False) as fh:
        fh.write(b">c1\n" + REF + b"\n>c2\nTTGGCCAATTGG\n")
        path = fh.name
    try:
        os.environ["JF_CRAM_REF"] = path
        out = decode(blob)
    finally:
        del os.environ["JF_CRAM_REF"]
        os.unlink(path)
    assert out == fasta(b"r", b"TTGGCC")


def test_multi_slice_and_multi_container():
    series_a = cw.default_series()
    sl1 = cw.encode_slice(series_a, RECORDS[:2], record_counter=0)
    sl2 = cw.encode_slice(series_a, RECORDS[2:], record_counter=2)
    comp_a = cw.compression_header(series_a)
    cont_a = cw.data_container(comp_a, sl1 + sl2,
                               1 + cw.count_blocks(sl1 + sl2), 3, 0)
    series_b = cw.default_series()
    more = [{"name": b"r4", "seq": b"TTTT", "qual": None}]
    sl3 = cw.encode_slice(series_b, more, record_counter=3)
    cont_b = cw.data_container(cw.compression_header(series_b), sl3,
                               1 + cw.count_blocks(sl3), 1, 3)
    blob = (cw.file_definition() + cw.sam_header_container(b"@HD\n")
            + cont_a + cont_b + cw.eof_container())
    assert decode(blob) == b"".join(EXPECT) + fasta(b"r4", b"TTTT")


def test_missing_eof_container_tolerated():
    blob = simple_cram(RECORDS)
    blob = blob[:-len(cw.eof_container())]
    assert decode(blob) == b"".join(EXPECT)


# ------------------------------------------------------------- failures


def test_rejects_cram_v1():
    blob = b"CRAM\x01\x00" + b"\x00" * 20
    with pytest.raises(CramError, match="version 1.0"):
        decode(blob)


# ------------------------------------------------------- 2.x legacy framing
# CRAM 2.x differs from 3.0 only in framing: no CRC32 on container
# headers or blocks, itf8 (not ltf8) record counters in container and
# slice headers (htslib cram_read_container / cram_decode_slice_header
# gate exactly these on major >= 3). Codecs and features are shared, so
# the 3.0 expectations apply verbatim.


@pytest.mark.parametrize("version", [(2, 0), (2, 1)])
def test_v2_unmapped_roundtrip(version):
    assert decode(simple_cram(RECORDS, version=version)) == b"".join(EXPECT)


def test_v2_mapped_features_embedded_ref():
    rec = {"name": b"m1", "mapped": True, "pos": 3, "rlen": 12,
           "features": [(5, "X", 1)], "qual": None}
    out = decode(simple_cram(
        [rec], sam_text=b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:36\n", ref_id=0,
        start=1, span=36, embedded_ref=REF, version=(2, 1)))
    # pos 3 len 12 = REF[2:14] with a substitution at read offset 4:
    # ref base REF[6] = 'G', SM default code 1 -> 'C' (ACGTN minus G)
    want = bytearray(REF[2:14])
    assert want[4] == ord("G")
    want[4] = ord("C")
    assert out == fasta(b"m1", bytes(want))


def test_v2_legacy_preservation_keys():
    """cramtools-era 2.x files may carry CRAM 1.0 preservation keys
    MI/UI/PI (single-byte booleans); htslib skips them and so must we
    (cram_decode_compression_header tolerance, ADVICE round 2)."""
    legacy = (b"MI\x01", b"UI\x01", b"PI\x00")
    blob = simple_cram(RECORDS, version=(2, 0), extra_pres=legacy)
    assert decode(blob) == b"".join(EXPECT)


@pytest.mark.parametrize("method", ["gzip", "bzip2"])
def test_v2_era_block_compression(method):
    methods = {cw.CORE: method, "slice_header": method}
    for cid in range(1, 30):
        methods[cid] = method
    series = cw.default_series()
    sl = cw.encode_slice(series, RECORDS, block_methods=methods, v3=False)
    comp = cw.compression_header(series)
    blob = (cw.file_definition(version=(2, 1))
            + cw.sam_header_container(b"@HD\tVN:1.6\n", method=method,
                                      v3=False)
            + cw.data_container(comp, sl, 1 + cw.count_blocks(sl, v3=False),
                                len(RECORDS), 0, comp_method=method,
                                v3=False)
            + cw.eof_container(v3=False))
    assert decode(blob) == b"".join(EXPECT)


def test_v2_multi_slice_large_record_counter():
    """record_counter with itf8 first byte >= 0xF8 (top bit of the
    value set): a decoder misreading the 2.x counters as ltf8 would
    consume 6 bytes instead of 5 and mis-frame the slice header. (A
    value just below 2^31 would NOT catch that regression: its 5-byte
    itf8 leads with 0xF7, which ltf8 also frames as 5 bytes.)"""
    series = cw.default_series()
    base = (1 << 31) + 5  # itf8 leading byte 0xF8
    sl1 = cw.encode_slice(series, RECORDS[:2], record_counter=base,
                          v3=False)
    sl2 = cw.encode_slice(series, RECORDS[2:], record_counter=base + 2,
                          v3=False)
    comp = cw.compression_header(series)
    cont = cw.data_container(comp, sl1 + sl2,
                             1 + cw.count_blocks(sl1 + sl2, v3=False), 3,
                             base, v3=False)
    blob = (cw.file_definition(version=(2, 0))
            + cw.sam_header_container(b"@HD\n", v3=False) + cont
            + cw.eof_container(v3=False))
    assert decode(blob) == b"".join(EXPECT)


def test_v2_native_and_python_agree(monkeypatch):
    blob = simple_cram(RECORDS, version=(2, 1))
    native = decode(blob)
    monkeypatch.setenv("JF_NO_NATIVE", "1")
    assert decode(blob) == native


def test_rejects_corrupt_block_crc():
    blob = bytearray(simple_cram(RECORDS))
    # flip one byte inside the container body region (past headers)
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises((CramError, Exception)):
        decode(bytes(blob))


def test_rejects_unknown_codec():
    series = cw.default_series()
    series["RL"].codec = 2  # claim GOLOMB in the header
    with pytest.raises(CramError, match="codec 2"):
        decode(simple_cram(RECORDS, series=series))


def test_kitchen_sink_interactions(monkeypatch):
    """All core codecs live in ONE slice (constant + real HUFFMAN, BETA,
    GAMMA, SUBEXP, BYTE_ARRAY_STOP, BYTE_ARRAY_LEN) alongside mapped
    feature records and mixed block compression — native and python
    paths byte-agree and match the expected reconstruction."""
    series = cw.default_series(with_features=True)
    series["BF"] = Huffman([4, 0], [1, 1])      # unmapped + mapped mix
    series["CF"] = Huffman([1, 0], [1, 1])      # qual-array flag varies
    series["RL"] = Beta(0, 7)
    series["AP"] = Gamma(3)                      # deltas go down to -2
    series["RG"] = SubExp(1, 2)
    series["TL"] = Huffman([0], [0])
    series["RN"] = ByteArrayStop(0x00, 31)
    series["FN"] = Gamma(1)
    series["FP"] = Beta(0, 7)
    series["MQ"] = Huffman([30], [0])
    series["BS"] = Huffman([0, 1, 2, 3], [2, 2, 2, 2])
    recs = [
        {"name": b"u1", "seq": b"ACGTNACGT" * 3, "qual": None},
        {"name": b"m1", "mapped": True, "pos": 4, "rlen": 10,
         "features": [(2, "X", 3), (5, "S", b"GG"), (8, "D", 2)],
         "qual": bytes(range(10))},
        {"name": b"m2", "mapped": True, "pos": 2, "rlen": 6,
         "features": [], "qual": None},   # AP delta -2
        {"name": b"u2", "seq": b"T" * 40, "qual": bytes([5] * 40)},
    ]
    blob = simple_cram(
        recs, ref_id=0, start=1, span=36, embedded_ref=REF,
        series=series,
        sam_text=b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:36\n",
        block_methods={cw.CORE: "rans0", 8: "gzip", 9: "rans1",
                       31: "bzip2", 22: "lzma"})
    native = decode(blob)
    monkeypatch.setenv("JF_NO_NATIVE", "1")
    python = decode(blob)
    monkeypatch.delenv("JF_NO_NATIVE")
    assert native == python
    # m1 at pos 4 (ref_pos 0-based 3 = 'T'): read 1 match 'T' (ref->4),
    # read 2 X on ref[4]='A' code 3 -> 'N' (A's candidates C,G,T,N;
    # ref->5), read 3-4 match ref[5:7]='CG' (ref->7), read 5-6 S 'GG'
    # (ref stays 7), read 7 match ref[7]='T' (ref->8), D(2) skips
    # ref[8:10]='AC' (ref->10), read 8-10 match ref[10:13]='GTA'
    m1_seq = b"T" + b"N" + b"CG" + b"GG" + b"T" + b"GTA"
    assert fastq(b"m1", m1_seq, bytes(range(10))) in native
    # m2 at pos 2: ref 0-based 1..6 = CGTACG
    assert fasta(b"m2", b"CGTACG") in native
    assert fasta(b"u1", b"ACGTNACGT" * 3) in native


def test_native_and_python_paths_agree(monkeypatch):
    """The C++ slice decoder (native/chunker.cpp jf_cram_slice) and the
    python reference path must produce identical bytes."""
    rec_m = {"name": b"m", "mapped": True, "pos": 2, "rlen": 15,
             "features": [(3, "X", 2), (5, "I", b"GG"), (9, "D", 1),
                          (12, "S", b"TTTT")], "qual": bytes(range(15))}
    blob = _mapped_blob([rec_m] + RECORDS[:2], embedded=REF)
    native = decode(blob)
    monkeypatch.setenv("JF_NO_NATIVE", "1")
    python = decode(blob)
    assert native == python
    assert native.count(b"\n") >= 8


# ----------------------------------------------------------- parse + CLI


def test_gzipped_cram_through_open_stream(tmp_path):
    """x.cram.gz: open_stream's gzip sniffing layers transparently over
    the CRAM container stream."""
    import gzip

    from jellyfish_tpu.io.parse import open_stream

    path = tmp_path / "reads.cram.gz"
    path.write_bytes(gzip.compress(simple_cram(RECORDS)))
    out = b"".join(sam_records_to_fastx(open_stream(str(path))))
    assert out == b"".join(EXPECT)


def test_mixed_formats_concurrent_files(tmp_path):
    """-F over a FASTQ + a BAM-free mix incl. CRAM matches serial."""
    from jellyfish_tpu.io.parse import SequenceChunker
    from jellyfish_tpu.mer import string_mers

    fq = tmp_path / "a.fq"
    fq.write_bytes(b"@x\nACGTACGTACGTACG\n+\n" + b"I" * 15 + b"\n")
    cram = tmp_path / "b.cram"
    cram.write_bytes(simple_cram(RECORDS))

    def counts(nb_files):
        ch = SequenceChunker([str(fq)], 11, 512,
                             sam_paths=[str(cram)], nb_files=nb_files)
        got = {}
        for chunk in ch.chunks():
            for m in string_mers(chunk.tobytes().decode(), 11):
                got[m] = got.get(m, 0) + 1
        return got

    serial = counts(1)
    assert serial and counts(2) == serial


def test_sam_adapter_dispatches_cram(tmp_path):
    path = tmp_path / "reads.cram"
    path.write_bytes(simple_cram(RECORDS))
    from jellyfish_tpu.io.parse import open_stream
    out = b"".join(sam_records_to_fastx(open_stream(str(path))))
    assert out == b"".join(EXPECT)


def test_cli_count_cram_equals_fastq(tmp_path, capsys):
    """`count --sam reads.cram` produces the same table as counting the
    equivalent FASTQ."""
    from test_cli import run_cli, _dump_dict

    rng = random.Random(99)
    recs = []
    fq_lines = []
    for i in range(40):
        seq = bytes(rng.choices(b"ACGT", k=rng.randrange(25, 60)))
        qual = bytes(rng.randrange(10, 40) for _ in seq)
        recs.append({"name": f"r{i}".encode(), "seq": seq, "qual": qual})
        fq_lines.append(b"@r%d\n%s\n+\n%s\n"
                        % (i, seq, bytes(q + 33 for q in qual)))
    cram_path = tmp_path / "reads.cram"
    cram_path.write_bytes(simple_cram(recs, block_methods={
        cw.CORE: "rans0", 8: "rans1", 9: "rans0", 6: "gzip"}))
    fq_path = tmp_path / "reads.fq"
    fq_path.write_bytes(b"".join(fq_lines))

    db_c = tmp_path / "c.jf"
    db_f = tmp_path / "f.jf"
    run_cli(["count", "-m", "15", "-s", "16k", "-C", "--sam",
             str(cram_path), "-o", str(db_c)])
    run_cli(["count", "-m", "15", "-s", "16k", "-C", "-o", str(db_f),
             str(fq_path)])
    assert _dump_dict(capsys, str(db_c)) == _dump_dict(capsys, str(db_f))

    # quality filtering flows through CRAM quals identically
    db_cq = tmp_path / "cq.jf"
    db_fq = tmp_path / "fq.jf"
    run_cli(["count", "-m", "15", "-s", "16k", "-C", "-Q", "5", "--sam",
             str(cram_path), "-o", str(db_cq)])
    run_cli(["count", "-m", "15", "-s", "16k", "-C", "-Q", "5",
             "-o", str(db_fq), str(fq_path)])
    got_q = _dump_dict(capsys, str(db_cq))
    assert got_q == _dump_dict(capsys, str(db_fq))
    assert got_q  # the threshold keeps some mers

    # same reads through legacy 2.1 framing (gzip-era codecs) count
    # identically
    cram2_path = tmp_path / "reads.v21.cram"
    cram2_path.write_bytes(simple_cram(
        recs, version=(2, 1),
        block_methods={cw.CORE: "gzip", 8: "bzip2", 9: "gzip"}))
    db_c2 = tmp_path / "c2.jf"
    run_cli(["count", "-m", "15", "-s", "16k", "-C", "--sam",
             str(cram2_path), "-o", str(db_c2)])
    assert _dump_dict(capsys, str(db_c2)) == \
        _dump_dict(capsys, str(db_f))


def test_mapped_external_ref_m5_cache(tmp_path, monkeypatch):
    """htslib REF_CACHE convention: the reference is found by the @SQ
    M5 tag in a cache of raw-sequence files named by MD5 hex — flat
    directory and %Ns/%s template forms — and checksummed."""
    import hashlib

    monkeypatch.delenv("JF_CRAM_REF", raising=False)
    m5 = hashlib.md5(REF).hexdigest()
    sam = (b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:36\tM5:" + m5.encode() + b"\n")
    rec = {"name": b"c", "mapped": True, "pos": 7, "rlen": 10,
           "features": [], "qual": None}
    blob = _mapped_blob([rec], sam_text=sam)

    # flat directory holding the raw sequence bytes
    flat = tmp_path / "cache"
    flat.mkdir()
    (flat / m5).write_bytes(REF)
    monkeypatch.setenv("JF_CRAM_REF_CACHE", str(flat))
    assert decode(blob) == fasta(b"c", REF[6:16])

    # htslib-style %2s/%2s/%s template via the REF_CACHE env var
    monkeypatch.delenv("JF_CRAM_REF_CACHE", raising=False)
    nested = tmp_path / "nest" / m5[:2] / m5[2:4]
    nested.mkdir(parents=True)
    (nested / m5[4:]).write_bytes(REF)
    monkeypatch.setenv("REF_CACHE",
                       str(tmp_path / "nest") + "/%2s/%2s/%s")
    assert decode(blob) == fasta(b"c", REF[6:16])

    # a corrupted cache entry fails the M5 checksum loudly
    (nested / m5[4:]).write_bytes(REF[:-1] + b"T")
    with pytest.raises(CramError, match="M5 checksum"):
        decode(blob)


def test_mapped_ref_env_m5_mismatch(tmp_path, monkeypatch):
    """A JF_CRAM_REF fasta whose sequence contradicts the @SQ M5 tag
    is rejected (htslib rule: MD5 over the uppercase sequence)."""
    monkeypatch.delenv("REF_CACHE", raising=False)
    wrong = REF[:-1] + b"T"
    ref_fa = tmp_path / "wrong.fa"
    ref_fa.write_bytes(b">chr1\n" + wrong + b"\n")
    monkeypatch.setenv("JF_CRAM_REF", str(ref_fa))
    import hashlib
    sam = (b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:36\tM5:"
           + hashlib.md5(REF).hexdigest().encode() + b"\n")
    rec = {"name": b"x", "mapped": True, "pos": 1, "rlen": 8,
           "features": [], "qual": None}
    with pytest.raises(CramError, match="M5 checksum"):
        decode(_mapped_blob([rec], sam_text=sam))
