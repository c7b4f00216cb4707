"""Host I/O-path throughput: native scanner / packer / BAM / CRAM / rANS.

Reproduces the PERF.md host-side numbers on the current machine (pure
CPU; no device). Prints one JSON object per path:

    python experiments/io_bench.py          # default sizes
    JF_IO_BENCH_MB=64 python experiments/io_bench.py
"""

import gzip
import io
import json
import os
import random
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402

MB = float(os.environ.get("JF_IO_BENCH_MB", 24))


def out(name, mbytes, seconds, **extra):
    print(json.dumps({
        "path": name, "MB_per_s": round(mbytes / seconds, 1),
        "seconds": round(seconds, 3), **extra,
    }))


def bench_chunker():
    from jellyfish_tpu.io.parse import SequenceChunker

    rng = random.Random(1)
    reads = []
    total = 0
    while total < MB * 1e6:
        s = "".join(rng.choices("ACGT", k=150))
        reads.append(f"@r{len(reads)}\n{s}\n+\n{'I' * 150}\n")
        total += 160
    path = "/tmp/io_bench.fq"
    with open(path, "w") as f:
        f.write("".join(reads))
    nbytes = os.path.getsize(path)
    t0 = time.perf_counter()
    n = sum(len(c) for c in
            SequenceChunker([path], 21, 1 << 20).chunks())
    t1 = time.perf_counter()
    out("fastq_scan_native", nbytes / 1e6, t1 - t0, chunk_bytes=n)
    t0 = time.perf_counter()
    n = sum(len(p) for p, _ in
            SequenceChunker([path], 21, 1 << 20).chunks_packed())
    t1 = time.perf_counter()
    out("fastq_scan_plus_pack", nbytes / 1e6, t1 - t0)


def bench_bam():
    rng = random.Random(2)
    body = bytearray(b"BAM\x01")
    text = b"@HD\tVN:1.6\n"
    body += struct.pack("<i", len(text)) + text + struct.pack("<i", 0)
    n_rec = int(MB * 1e6 / 160)
    for i in range(n_rec):
        name = b"r%d" % i
        nibs = rng.choices([1, 2, 4, 8], k=100)
        packed = bytes((nibs[j] << 4) | nibs[j + 1]
                       for j in range(0, 100, 2))
        qual = bytes(rng.randrange(40) for _ in range(100))
        rec = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0,
                          4680, 0, 4, 100, -1, -1, 0)
        rec += name + b"\x00" + packed + qual
        body += struct.pack("<i", len(rec)) + rec
    path = "/tmp/io_bench.bam"
    with open(path, "wb") as f:
        f.write(gzip.compress(bytes(body)))
    from jellyfish_tpu.io.parse import open_stream, sam_records_to_fastx

    t0 = time.perf_counter()
    total = sum(len(r) for r in sam_records_to_fastx(open_stream(path)))
    t1 = time.perf_counter()
    out("bam_records_native", n_rec * 100 / 1e6, t1 - t0,
        rec_per_s=int(n_rec / (t1 - t0)), out_bytes=total)


def bench_cram():
    from cram_writer import simple_cram
    import cram_writer as cw
    from jellyfish_tpu.io.cram import cram_records_to_fastx

    rng = random.Random(3)
    n_rec = int(MB * 1e6 / 200)
    recs = [{"name": b"r%d" % i,
             "seq": bytes(rng.choices(b"ACGT", k=100)),
             "qual": bytes(rng.randrange(40) for _ in range(100))}
            for i in range(n_rec)]
    blob = simple_cram(recs, block_methods={
        cw.CORE: "rans0", 8: "rans1", 9: "rans1", 6: "gzip"})
    t0 = time.perf_counter()
    stream = io.BytesIO(blob)
    stream.read(4)
    total = sum(len(c) for c in cram_records_to_fastx(stream))
    t1 = time.perf_counter()
    out("cram_records_native", n_rec * 100 / 1e6, t1 - t0,
        rec_per_s=int(n_rec / (t1 - t0)), cram_mb=round(len(blob) / 1e6, 1),
        out_bytes=total)


def bench_cram31():
    """End-to-end CRAM 3.1 ingest: tok3 names + rANS Nx16 sequences +
    fqzcomp qualities, through the full container reader. The fixture
    is MULTI-SLICE (10k records per slice like htslib's default) so the
    reader's slice-parallel thread pool has real work units; set
    JF_CRAM_THREADS=1 to measure the sequential path."""
    from cram_writer import fqz_method, ByteArrayStop
    import cram_writer as cw
    from jellyfish_tpu.io.cram import cram_records_to_fastx

    rng = random.Random(31)
    # at least 12 slices of 10k records: shorter fixtures are dominated
    # by thread-pool startup and under-report the amortized rate (the
    # PERF.md rec/s claims are measured at 200k records)
    n_rec = max(int(MB * 1e6 / 600), 120_000)
    recs = []
    for i in range(n_rec):
        qual = bytearray()
        q = 38
        for _ in range(100):
            q = min(40, max(30, q + rng.choice([-1, 0, 0, 1])))
            qual.append(q)
        recs.append({"name": b"SRR9.%d HWI:7:1101:%d:%d/1"
                     % (i, 1000 + i, 3 * i),
                     "seq": bytes(rng.choices(b"ACGT", k=100)),
                     "qual": bytes(qual)})
    S = 10000
    parts = [cw.file_definition(version=(3, 1)),
             cw.sam_header_container(b"@HD\tVN:1.6\n")]
    counter = 0
    for i in range(0, n_rec, S):
        chunk = recs[i:i + S]
        series = cw.default_series()
        series["RN"] = ByteArrayStop(0, 6)
        comp = cw.compression_header(series)
        sl = cw.encode_slice(
            series, chunk, record_counter=counter,
            block_methods={cw.CORE: "rans16", 8: "rans16-o1", 6: "tok3",
                           9: fqz_method([100] * len(chunk))})
        parts.append(cw.data_container(
            comp, sl, 1 + cw.count_blocks(sl), len(chunk), counter))
        counter += len(chunk)
    parts.append(cw.eof_container())
    blob = b"".join(parts)
    t0 = time.perf_counter()
    stream = io.BytesIO(blob)
    stream.read(4)
    total = sum(len(c) for c in cram_records_to_fastx(stream))
    t1 = time.perf_counter()
    out("cram31_records_native", n_rec * 100 / 1e6, t1 - t0,
        rec_per_s=int(n_rec / (t1 - t0)), cram_mb=round(len(blob) / 1e6, 1),
        out_bytes=total,
        threads=int(os.environ.get("JF_CRAM_THREADS",
                                   min(4, os.cpu_count() or 1))))
    # the plain-counting ingest path (no -Q): quality blocks are never
    # decoded (cram_records_to_fastx need_quals=False) — fqz decode is
    # the dominant cost of quality-heavy CRAMs, so this is the headline
    # "count a CRAM archive" rate
    t0 = time.perf_counter()
    stream = io.BytesIO(blob)
    stream.read(4)
    total = sum(len(c)
                for c in cram_records_to_fastx(stream, need_quals=False))
    t1 = time.perf_counter()
    out("cram31_records_native_noqual", n_rec * 100 / 1e6, t1 - t0,
        rec_per_s=int(n_rec / (t1 - t0)), out_bytes=total,
        threads=int(os.environ.get("JF_CRAM_THREADS",
                                   min(4, os.cpu_count() or 1))))


def bench_rans():
    from jellyfish_tpu.io import rans

    rng = random.Random(4)
    raw = bytes(rng.choices(b"ACGT", weights=[40, 30, 20, 10],
                            k=int(MB * 1e6 / 6)))
    for order in (0, 1):
        blob = rans.encode(raw, order)
        t0 = time.perf_counter()
        got = rans.decode(blob)
        t1 = time.perf_counter()
        assert got == raw
        out(f"rans{order}_decode_native", len(raw) / 1e6, t1 - t0)


def bench_rans16():
    from jellyfish_tpu.io import rans16

    rng = random.Random(5)
    raw = bytes(rng.choices(b"ACGT", weights=[40, 30, 20, 10],
                            k=int(MB * 1e6 / 6)))
    for flags, name in ((0, "o0x4"), (rans16.F_ORDER1, "o1x4"),
                        (rans16.F_ORDER1 | rans16.F_N32, "o1x32")):
        blob = rans16.encode(raw, flags)
        t0 = time.perf_counter()
        got = rans16.decode(blob, len(raw))
        t1 = time.perf_counter()
        assert got == raw
        out(f"rans16_{name}_decode_native", len(raw) / 1e6, t1 - t0)


def bench_adaptive():
    from jellyfish_tpu.io import arith, fqzcomp

    rng = random.Random(6)
    raw = bytes(rng.choices(b"!#%+5?I", k=int(MB * 1e6 / 30)))
    blob = arith.encode(raw, arith.F_ORDER1)
    t0 = time.perf_counter()
    got = arith.decode(blob, len(raw))
    t1 = time.perf_counter()
    assert got == raw
    out("arith_o1_decode_native", len(raw) / 1e6, t1 - t0)

    nrec = int(MB * 1e6 / 30 / 100)
    lens = [100] * nrec
    quals = bytearray()
    cur = 35
    for _ in range(nrec * 100):
        cur = min(40, max(30, cur + rng.choice([-1, 0, 0, 1])))
        quals.append(cur + 33)
    quals = bytes(quals)
    blob = fqzcomp.encode(lens, quals)
    t0 = time.perf_counter()
    got = fqzcomp.decode(blob, len(quals))
    t1 = time.perf_counter()
    assert got == quals
    out("fqz_decode_native", len(quals) / 1e6, t1 - t0)


if __name__ == "__main__":
    bench_chunker()
    bench_bam()
    bench_cram()
    bench_cram31()
    bench_rans()
    bench_rans16()
    bench_adaptive()
