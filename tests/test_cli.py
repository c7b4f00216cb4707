"""End-to-end CLI tests (the reference's tests/*.sh tier): seeded data,
count -> histo/stats/dump/query agreement with the python oracle, disk
spill == in-memory, merge ops, bloom modes, --if, quality filtering."""

import io
import json
import sys

import numpy as np
import pytest

from tests.conftest import oracle_counts


def run_cli(argv, capsys=None):
    from jellyfish_tpu.cli import main

    rc = main(argv)
    assert rc == 0 or rc is None
    if capsys is not None:
        return capsys.readouterr().out
    return None


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    """Seeded FASTA/FASTQ fixtures (tests/generate_sequence.sh role)."""
    d = tmp_path_factory.mktemp("clidata")
    fa = str(d / "seq.fa")
    fq = str(d / "seq.fq")
    run_cli(["generate", "-s", "3141592653", "-m", "40k", "-r", "80", "-o", fa[:-3]])
    run_cli(["generate", "-s", "2718281828", "-m", "20k", "-q", "-o", fq[:-3]])
    return {"dir": d, "fa": fa, "fq": fq}


def _read_fasta_seqs(path):
    seqs, cur = [], []
    for line in open(path):
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
            cur = []
        else:
            cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    return seqs


def _dump_dict(capsys, db):
    out = run_cli(["dump", "-c", db], capsys)
    res = {}
    for line in out.splitlines():
        m, c = line.split()
        res[m] = int(c)
    return res


def test_count_matches_oracle(data, capsys):
    from jellyfish_tpu.mer import MerDNA

    db = str(data["dir"] / "o.jf")
    run_cli(["count", "-m", "13", "-s", "50k", "-C",
             "--chunk-len", "8k", "-o", db, data["fa"]])
    got = _dump_dict(capsys, db)
    expected = oracle_counts(_read_fasta_seqs(data["fa"]), 13, True)
    exp_str = {str(MerDNA(13, b)): c for b, c in expected.items()}
    assert got == exp_str


def test_histo_stats_consistency(data, capsys):
    db = str(data["dir"] / "o.jf")
    hist = run_cli(["histo", db], capsys)
    total_distinct = sum(int(line.split()[1]) for line in hist.splitlines())
    stats = run_cli(["stats", db], capsys)
    vals = dict(line.split(":") for line in stats.splitlines())
    assert int(vals["Distinct"].strip()) == total_distinct


def test_query_agrees_with_dump(data, capsys):
    db = str(data["dir"] / "o.jf")
    d = _dump_dict(capsys, db)
    some = list(d.items())[:20]
    out = run_cli(["query", db] + [m for m, _ in some], capsys)
    got = dict(line.split() for line in out.splitlines())
    for m, c in some:
        assert int(got[m]) == c
    # absent mer
    out = run_cli(["query", db, "A" * 13], capsys)
    mer, val = out.split()
    assert int(val) == d.get("A" * 13, 0)


def test_query_interactive_stdin(data, capsys):
    """query -i: one bare count per stdin line, flushed (query_main.cc
    query_from_stdin), invalid mers reported to stderr."""
    import os
    import subprocess
    import sys

    db = str(data["dir"] / "oq.jf")
    run_cli(["count", "-m", "13", "-s", "16k", "-C", "-o", db,
             data["fa"]])
    d = _dump_dict(capsys, db)
    some = list(d.items())[:5]
    stdin = "\n".join(m for m, _ in some) + "\nNOTAMER\n" + "A" * 13 + "\n"
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu", "query", "-i", db],
        input=stdin, env=env, capture_output=True, text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    vals = [int(x) for x in r.stdout.split()]
    assert vals == [c for _, c in some] + [d.get("A" * 13, 0)]
    assert "Invalid mer 'NOTAMER'" in r.stderr


def test_disk_spill_equals_memory(data, capsys):
    mem_db = str(data["dir"] / "mem.jf")
    disk_db = str(data["dir"] / "disk.jf")
    run_cli(["count", "-m", "11", "-s", "60k", "-o", mem_db,
             "--chunk-len", "8k", data["fa"]])
    run_cli(["count", "-m", "11", "-s", "4k", "--disk", "-o", disk_db,
             "--chunk-len", "8k", data["fa"]])
    m1 = _dump_dict(capsys, mem_db)
    m2 = _dump_dict(capsys, disk_db)
    assert m1 == m2


def test_merge_ops(data, capsys, tmp_path):
    # two spill partials share matrix/size -> mergeable (merge.sh semantics)
    pre = str(tmp_path / "part.jf")
    run_cli(["count", "-m", "11", "-s", "2k", "--disk", "--no-merge",
             "--no-unlink", "--chunk-len", "8k", "-o", pre, data["fa"]])
    import glob

    parts = sorted(glob.glob(pre + "[0-9]*"))
    assert len(parts) >= 2
    outsum = str(tmp_path / "sum.jf")
    run_cli(["merge", "-o", outsum] + parts)
    outmax = str(tmp_path / "max.jf")
    run_cli(["merge", "-M", "-o", outmax] + parts)
    s = _dump_dict(capsys, outsum)
    full = _dump_dict(capsys, str(data["dir"] / "mem.jf"))
    assert s == full
    mx = _dump_dict(capsys, outmax)
    assert all(mx[m] <= c for m, c in s.items())
    outj = str(tmp_path / "j.txt")
    run_cli(["merge", "-j", "-o", outj] + parts, capsys)
    lines = open(outj).read().splitlines()
    assert lines[0].startswith("Jaccard ") and lines[1].startswith("wJaccard")


def test_quality_filtering(data, capsys):
    db_all = str(data["dir"] / "q0.jf")
    db_filt = str(data["dir"] / "q1.jf")
    run_cli(["count", "-m", "13", "-s", "30k", "-o", db_all, data["fq"]])
    run_cli(["count", "-m", "13", "-s", "30k", "--min-quality", "20",
             "--quality-start", "66", "-o", db_filt, data["fq"]])
    a = _dump_dict(capsys, db_all)
    f = _dump_dict(capsys, db_filt)
    assert sum(f.values()) < sum(a.values())
    assert all(f[m] <= a[m] for m in f)


def test_if_subset(data, capsys, tmp_path):
    sub = str(tmp_path / "sub.fa")
    with open(data["fa"]) as src, open(sub, "w") as dst:
        dst.write("".join(src.readlines()[:20]))
    db = str(tmp_path / "if.jf")
    run_cli(["count", "-m", "13", "-s", "30k", "-C", "--if", sub,
             "-o", db, data["fa"]])
    got = _dump_dict(capsys, db)
    allowed = set(oracle_counts(_read_fasta_seqs(sub), 13, True))
    full = oracle_counts(_read_fasta_seqs(data["fa"]), 13, True)
    from jellyfish_tpu.mer import MerDNA

    expected = {str(MerDNA(13, b)): full[b] for b in allowed}
    assert got == expected


def test_bc_two_pass(data, capsys, tmp_path):
    bcf = str(tmp_path / "f.bc")
    db = str(tmp_path / "bc.jf")
    run_cli(["bc", "-m", "13", "-s", "100k", "-C", "-o", bcf, data["fa"]])
    run_cli(["count", "-m", "13", "-s", "30k", "-C", "--bc", bcf,
             "-o", db, data["fa"]])
    got = _dump_dict(capsys, db)
    full = oracle_counts(_read_fasta_seqs(data["fa"]), 13, True)
    from jellyfish_tpu.mer import MerDNA

    true_ge2 = {str(MerDNA(13, b)): c for b, c in full.items() if c >= 2}
    # no false negatives: every true >=2 mer is present with its exact count
    for m, c in true_ge2.items():
        assert got.get(m) == c
    # false positives are rare (filter sized at 100k for ~39k distinct)
    assert len(got) - len(true_ge2) <= 0.01 * len(full)


def test_generators(data, capsys, tmp_path):
    gens = str(tmp_path / "gens.txt")
    with open(gens, "w") as f:
        f.write(f"cat {data['fa']}\n")
    db = str(tmp_path / "gen.jf")
    run_cli(["count", "-m", "13", "-s", "30k", "-C", "-g", gens, "-o", db])
    direct = _dump_dict(capsys, str(data["dir"] / "o.jf"))
    got = _dump_dict(capsys, db)
    assert got == direct


def test_info_and_mem(data, capsys):
    db = str(data["dir"] / "o.jf")
    out = run_cli(["info", "-j", db], capsys)
    h = json.loads(out)
    assert h["key_len"] == 26 and h["canonical"] is True
    out = run_cli(["mem", "-m", "24", "-s", "1G"], capsys)
    assert out.split()[0] == "4521043056"  # doc/Readme.md:262-267
    out = run_cli(["mem", "-m", "31", "--mem", "8G"], capsys)
    assert out.split()[0] == "1073741824"  # doc/Readme.md:272-276
    out = run_cli(["cite"], capsys)
    assert "Bioinformatics" in out


def test_if_with_disk_spill(data, capsys, tmp_path):
    """--if must be honored by --disk spill partials too (the reference
    primes the table before counting, count_main.cc:288-295)."""
    sub = str(tmp_path / "sub.fa")
    with open(data["fa"]) as src, open(sub, "w") as dst:
        dst.write("".join(src.readlines()[:20]))
    db_mem = str(tmp_path / "ifmem.jf")
    db_disk = str(tmp_path / "ifdisk.jf")
    run_cli(["count", "-m", "13", "-s", "30k", "-C", "--if", sub,
             "-o", db_mem, data["fa"]])
    run_cli(["count", "-m", "13", "-s", "2k", "-C", "--disk", "--if", sub,
             "--chunk-len", "8k", "-o", db_disk, data["fa"]])
    assert _dump_dict(capsys, db_disk) == _dump_dict(capsys, db_mem)


def test_suffix_int_uppercase_k():
    from jellyfish_tpu.cli.common import suffix_int

    assert suffix_int("10K") == 10_000
    assert suffix_int("10k") == 10_000
    assert suffix_int("2G") == 2_000_000_000
    assert suffix_int("3m") == 3_000_000


def test_generator_failure_propagates(tmp_path):
    """A generator command that fails mid-stream must raise, not silently
    fall back to re-parsing (which double-counts yielded bases)."""
    from jellyfish_tpu.io.parse import SequenceChunker

    fa = tmp_path / "g.fa"
    fa.write_text(">r1\n" + "ACGT" * 100 + "\n")
    ch = SequenceChunker([], 13, chunk_len=1 << 14,
                         generator_cmds=[f"cat {fa}; exit 3"])
    with pytest.raises(RuntimeError, match="status 3"):
        for _ in ch.chunks():
            pass


def test_fastq2sam_roundtrip(tmp_path):
    fq = tmp_path / "reads.fastq"
    fq.write_bytes(b"@r1 extra\nACGTACGT\n+\nIIIIIIII\n@r2\nTTTT\n+\n!!!!\n")
    run_cli(["fastq2sam", str(fq)])
    sam = (tmp_path / "reads.sam").read_bytes()
    assert sam == (
        b"r1 extra\t4\t*\t0\t0\t*\t*\t0\t0\tACGTACGT\tIIIIIIII\n"
        b"r2\t4\t*\t0\t0\t*\t*\t0\t0\tTTTT\t!!!!\n"
    )


def test_query_sequence_file_batch(tmp_path, capsys):
    """query -s uses the vectorized batch path; counts match per-mer
    lookups, and -l preload works."""
    import numpy as np

    fa = tmp_path / "in.fa"
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), size=800))
    fa.write_text(f">r\n{seq}\n")
    db = tmp_path / "db.jf"
    run_cli(["count", "-m", "15", "-s", "4k", "-C", "-o", str(db), str(fa)])
    qf = tmp_path / "q.fa"
    qseq = seq[100:200] + "N" + seq[300:350]
    qf.write_text(f">q\n{qseq}\n")
    out_ = run_cli(["query", "-s", str(qf), str(db)], capsys)
    lines = out_.strip().splitlines()
    from jellyfish_tpu.mer import string_canonicals, string_mers

    exp_mers = [str(m) for m in string_mers(qseq, 15)]
    assert [l.split()[0] for l in lines] == exp_mers
    # every queried window came from the counted sequence: count >= 1
    assert all(int(l.split()[1]) >= 1 for l in lines)
    out2 = run_cli(["query", "-l", "-s", str(qf), str(db)], capsys)
    assert out2 == out_


@pytest.mark.slow
def test_disk_equals_memory_at_scale(tmp_path, capsys):
    """>=10 Mbase end-to-end: --disk spill+streaming-merge produces the
    same histo/stats as the in-memory run (the at-scale validation that
    was previously only a PERF.md prose claim)."""
    fa = tmp_path / "big"
    run_cli(["generate", "-s", "1618033988", "-m", "10M", "-r", "1k",
             "-o", str(fa)])
    mem_db = tmp_path / "mem.jf"
    disk_db = tmp_path / "disk.jf"
    run_cli(["count", "-m", "21", "-s", "20M", "-C", "-o", str(mem_db),
             f"{fa}.fa"])
    # small -s forces multiple spill+merge rounds through the streaming
    # k-way merge
    run_cli(["count", "-m", "21", "-s", "1M", "-C", "--disk",
             "-o", str(disk_db), f"{fa}.fa"])
    h1 = run_cli(["histo", str(mem_db)], capsys)
    h2 = run_cli(["histo", str(disk_db)], capsys)
    assert h1 == h2
    s1 = run_cli(["stats", str(mem_db)], capsys)
    s2 = run_cli(["stats", str(disk_db)], capsys)
    assert s1 == s2
    assert "Total:" in s1


def test_generators_concurrent_G(tmp_path):
    """-G pre-starts G generator subprocesses concurrently
    (generator_manager.hpp:62-162 runs G children at once); with G=2 and 3
    commands, the 2nd command must already be running while the 1st stream
    is consumed, and the 3rd must not start until the 1st finishes."""
    import time as _t

    from jellyfish_tpu.io.parse import SequenceChunker
    from tests.conftest import oracle_counts

    seqs = ["ACGTACGTACGTACGTACGT", "TTTTGGGGCCCCAAAATTTT", "GATTACAGATTACA"]
    fas, marks = [], []
    for i, s in enumerate(seqs):
        fa = tmp_path / f"g{i}.fa"
        fa.write_text(f">r{i}\n{s}\n")
        fas.append(fa)
        marks.append(tmp_path / f"started{i}")
    cmds = [f"touch {m}; cat {f}" for m, f in zip(marks, fas)]

    ch = SequenceChunker([], 5, chunk_len=256, generator_cmds=cmds,
                         nb_generators=2)
    it = ch._read_bytes()
    first = next(it)  # consuming stream 0 now
    deadline = _t.time() + 5
    while not (marks[0].exists() and marks[1].exists()):
        assert _t.time() < deadline, "generators 0/1 not both started"
        _t.sleep(0.01)
    assert not marks[2].exists(), "-G window exceeded: 3rd generator started"
    reads = [first] + list(it)
    assert marks[2].exists()
    got = [r.decode() for r in reads]
    assert got == seqs
    ch.close()


def test_generators_G_counts_unchanged(data, capsys, tmp_path):
    gens = str(tmp_path / "gens2.txt")
    with open(gens, "w") as f:
        f.write(f"cat {data['fa']}\n")
        f.write(f"cat {data['fa']}\n")
        f.write(f"cat {data['fa']}\n")
    db = str(tmp_path / "gen3.jf")
    run_cli(["count", "-m", "13", "-s", "30k", "-C", "-g", gens, "-G", "3",
             "-o", db])
    direct = _dump_dict(capsys, str(data["dir"] / "o.jf"))
    got = _dump_dict(capsys, db)
    assert set(got) == set(direct)
    assert all(got[m] == 3 * direct[m] for m in direct)


def test_if_all_n_input_dumps_primed_zeros(tmp_path, capsys):
    """--if with an input that yields no valid mers still dumps the primed
    set at count 0 (the reference's PRIME pass claims them before
    counting; they survive an empty UPDATE pass)."""
    from jellyfish_tpu.mer import string_canonicals

    alln = tmp_path / "alln.fa"
    alln.write_text(">r\n" + "N" * 60 + "\n")
    allow = tmp_path / "allow.fa"
    allow.write_text(">a\nACGTACGTACGTACGTA\n")
    db = tmp_path / "ifz.jf"
    run_cli(["count", "-m", "13", "-s", "16k", "-C", "--if", str(allow),
             "-o", str(db), str(alln)])
    got = _dump_dict(capsys, str(db))
    want = {str(m): 0 for m in string_canonicals("ACGTACGTACGTACGTA", 13)}
    assert got == want


def test_generate_fastq_read_length(tmp_path):
    """-r/--read-length must apply to FASTQ output too (it was silently
    ignored: every read came out 70 bases regardless)."""
    out = str(tmp_path / "g150")
    run_cli(["generate", "-s", "42", "-q", "-m", "3000", "-r", "150",
             "-o", out])
    lens = []
    with open(out + ".fq") as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines), 4):
        assert lines[i].startswith("@")
        lens.append(len(lines[i + 1]))
        assert len(lines[i + 3]) == lens[-1]  # qual matches seq
    assert set(lens[:-1]) == {150}  # full reads; the tail may be short
    assert sum(lens) == 3000
