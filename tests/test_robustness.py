"""Malformed/degenerate input handling (the reference dies with err::die;
we raise/exit with clear messages and never corrupt output)."""

import numpy as np
import pytest


def test_truncated_fastq_qual_mismatch(tmp_path):
    from jellyfish_tpu.io.parse import iter_reads

    p = tmp_path / "bad.fq"
    p.write_bytes(b"@r1\nACGTACGT\n+\nIIII\n@r2\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError, match="quality length"):
        list(iter_reads(open(p, "rb")))


def test_unknown_format(tmp_path):
    from jellyfish_tpu.io.parse import iter_reads

    p = tmp_path / "junk.txt"
    p.write_bytes(b"this is not sequence data\n")
    with pytest.raises(ValueError, match="unrecognized"):
        list(iter_reads(open(p, "rb")))


def test_empty_input_produces_empty_db(tmp_path):
    from jellyfish_tpu.cli import main as cli
    from jellyfish_tpu.io.files import DBReader

    fa = tmp_path / "empty.fa"
    fa.write_bytes(b"")
    db = str(tmp_path / "e.jf")
    cli(["count", "-m", "15", "-s", "1k", "-o", db, str(fa)])
    with DBReader(db) as r:
        assert list(r) == []
    # downstream tools handle the empty db
    cli(["histo", db])
    cli(["stats", db])


def test_reads_shorter_than_k(tmp_path):
    from jellyfish_tpu.cli import main as cli
    from jellyfish_tpu.io.files import DBReader

    fa = tmp_path / "short.fa"
    fa.write_text(">a\nACG\n>b\nACGTACGTACGTACGTACGTACG\n>c\nTT\n")
    db = str(tmp_path / "s.jf")
    cli(["count", "-m", "21", "-s", "1k", "-o", db, str(fa)])
    with DBReader(db) as r:
        recs = list(r)
    assert len(recs) == 3  # only read b has 21-mers (23 - 21 + 1 = 3)


def test_not_a_database(tmp_path):
    from jellyfish_tpu.io.header import FileHeader

    p = tmp_path / "x.bin"
    p.write_bytes(b"garbage data here")
    with pytest.raises(ValueError, match="not a jellyfish header"):
        with open(p, "rb") as f:
            FileHeader.read(f)


def test_merge_incompatible_dbs(tmp_path):
    from jellyfish_tpu.cli import main as cli
    from jellyfish_tpu.merge import MergeError, merge_files

    fa = tmp_path / "m.fa"
    fa.write_text(">a\n" + "ACGT" * 50 + "\n")
    db1 = str(tmp_path / "a.jf")
    db2 = str(tmp_path / "b.jf")
    cli(["count", "-m", "11", "-s", "1k", "-o", db1, str(fa)])
    cli(["count", "-m", "13", "-s", "1k", "-o", db2, str(fa)])
    with pytest.raises(MergeError, match="key length"):
        merge_files([db1, db2], str(tmp_path / "out.jf"))


def test_query_text_db_rejected(tmp_path):
    from jellyfish_tpu.cli import main as cli

    fa = tmp_path / "t.fa"
    fa.write_text(">a\n" + "ACGT" * 50 + "\n")
    db = str(tmp_path / "t.jf")
    cli(["count", "-m", "11", "-s", "1k", "--text", "-o", db, str(fa)])
    with pytest.raises(SystemExit):
        cli(["query", db, "ACGTACGTACG"])


def test_gzip_input(tmp_path, rng):
    import gzip

    from jellyfish_tpu.cli import main as cli
    from tests.conftest import oracle_counts, random_dna

    seq = random_dna(rng, 500)
    gz = tmp_path / "z.fa.gz"
    with gzip.open(gz, "wb") as f:
        f.write(f">r\n{seq}\n".encode())
    db = str(tmp_path / "z.jf")
    cli(["count", "-m", "15", "-s", "1k", "-o", db, str(gz)])
    from jellyfish_tpu.io.files import DBReader

    with DBReader(db) as r:
        got = dict(iter(r))
    assert got == oracle_counts([seq], 15, False)


def test_generator_children_reaped_on_abandon(tmp_path):
    """Abandoning chunk iteration mid-stream (downstream error/interrupt)
    terminates generator children instead of leaking them or hanging in
    wait() (lib/generator_manager.cc:186-215 role)."""
    import subprocess
    import time as _time

    from jellyfish_tpu.io.parse import SequenceChunker

    fa = tmp_path / "big.fa"
    with open(fa, "w") as f:
        f.write(">r\n")
        for _ in range(2000):
            f.write("ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n")

    ch = SequenceChunker(
        [], 21, chunk_len=4096,
        generator_cmds=[f"while true; do cat {fa}; done"],
    )
    it = ch.chunks()
    next(it)  # generator child is live and producing
    assert len(ch._procs) == 1
    proc = next(iter(ch._procs))
    it.close()  # abandon mid-stream (GeneratorExit into the finally)
    ch.close()
    deadline = _time.time() + 10
    while proc.poll() is None and _time.time() < deadline:
        _time.sleep(0.05)
    assert proc.poll() is not None, "generator child leaked after abandon"


def test_generator_exit_status_still_raises(tmp_path):
    """Normal exhaustion still surfaces a failing generator's status."""
    import pytest as _pytest

    from jellyfish_tpu.io.parse import SequenceChunker

    ch = SequenceChunker(
        [], 5, chunk_len=256,
        generator_cmds=["printf '>r\\nACGTACGTAC\\n'; exit 3"],
    )
    with _pytest.raises(RuntimeError, match="status 3"):
        list(ch.chunks())
