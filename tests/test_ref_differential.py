"""Whole-file differential counting against the ACTUAL reference pipeline.

The north-star correctness criterion is "histo/dump exact-match vs
reference jellyfish" (BASELINE.json). tests/ref_oracle.cc `count` mode
runs the reference's own stream_manager -> mer_overlap_sequence_parser ->
mer_iterator -> hash -> binary_dumper on a real file (count_main.cc's
whole path minus yaggo); here the same files go through OUR CLI and every
(mer, count) pair plus the histogram must agree exactly — Ns, seams, DOS
endings, FASTQ, canonicalization and all."""

import collections
import subprocess
import sys

import pytest

from tests.test_ref_interop import LIBS, REF, ref_oracle  # noqa: F401

pytestmark = []


def _run_cli(argv):
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu"] + argv,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def _ref_counts(ref_oracle, db):
    out = subprocess.run(
        [ref_oracle, "read", str(db)], check=True, capture_output=True
    ).stdout.decode()
    d = {}
    for line in out.splitlines():
        m, v = line.split()
        d[m] = int(v)
    return d


def _our_counts(db):
    out = _run_cli(["dump", "-c", str(db)])
    d = {}
    for line in out.splitlines():
        m, v = line.split()
        d[m] = int(v)
    return d


@pytest.fixture(scope="module")
def seq_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("diffseq")
    _run_cli(["generate", "-s", "271828", "-m", "40000", "-m", "15000",
              "-o", str(d / "gen")])  # two lengths -> gen_0.fa, gen_1.fa
    _run_cli(["generate", "-s", "314159", "-q", "-m", "30000", "-r", "75",
              "-o", str(d / "genq")])
    # handcrafted edge content: Ns, short reads, DOS endings, lowercase
    edge = d / "edge.fa"
    edge.write_bytes(
        b">r1\r\nACGTNNACGTACGTACGTACGTTGCA\r\n"
        b">r2\r\nacgtacgtacgtacgtacgA\r\n"
        b">tiny\r\nACG\r\n"
        b">r3\r\nNNNNACGTACGTACGTACGTACGTNNNN\r\n"
    )
    return [str(d / "gen_0.fa"), str(d / "gen_1.fa"), str(d / "genq.fq"),
            str(edge)]


@pytest.mark.parametrize("canonical", [False, True], ids=["fwd", "canon"])
def test_whole_file_counts_match_reference(ref_oracle, seq_files, tmp_path,
                                           canonical):
    k = 21
    flag = ["-C"] if canonical else []
    ref_db = tmp_path / f"ref{int(canonical)}.jf"
    subprocess.run(
        [ref_oracle, "count", str(ref_db), str(k), "262144",
         "1" if canonical else "0"] + seq_files,
        check=True, capture_output=True,
    )
    our_db = tmp_path / f"ours{int(canonical)}.jf"
    _run_cli(["count", "-m", str(k), "-s", "256k", "-o", str(our_db)]
             + flag + seq_files)

    ref = _ref_counts(ref_oracle, ref_db)
    ours = _our_counts(our_db)
    assert ours == ref

    # histo agreement (derived, but the criterion names it explicitly)
    want = collections.Counter(ref.values())
    histo = _run_cli(["histo", str(our_db)])
    got = {int(l.split()[0]): int(l.split()[1]) for l in histo.splitlines()}
    assert got == dict(want)


def test_quality_filtered_counts_match_reference(ref_oracle, seq_files,
                                                 tmp_path):
    """-Q filtering through the reference's own whole-sequence parser +
    mer_qual_iterator (bases below min qual become N) vs our min-qual
    staging path, on a generated FASTQ with Illumina-range qualities."""
    k = 21
    fq = seq_files[2]  # genq.fq
    ref_db = tmp_path / "refq.jf"
    subprocess.run(
        [ref_oracle, "count-qual", str(ref_db), str(k), "131072", "1", "5"]
        + [fq],
        check=True, capture_output=True,
    )
    our_db = tmp_path / "oursq.jf"
    _run_cli(["count", "-m", str(k), "-s", "128k", "-C", "-Q", "5",
              "-o", str(our_db), fq])
    assert _our_counts(our_db) == _ref_counts(ref_oracle, ref_db)


def test_disk_partials_merged_by_reference(ref_oracle, seq_files, tmp_path):
    """OUR --disk partials are valid inputs to the reference's own
    merge_files (same-matrix k-way heap merge, merge_files.cc:105-176),
    and its merged output equals our own merge of the same partials."""
    k = 21
    pre = tmp_path / "part.jf"
    _run_cli(["count", "-m", str(k), "-s", "8k", "-C", "--disk",
              "--no-merge", "--no-unlink", "-o", str(pre), seq_files[0]])
    import glob

    partials = sorted(glob.glob(str(pre) + "[0-9]*"))
    assert len(partials) >= 2, partials

    ref_merged = tmp_path / "refmerged.jf"
    subprocess.run(
        [ref_oracle, "merge", str(ref_merged), "sum"] + partials,
        check=True, capture_output=True,
    )
    our_merged = tmp_path / "ourmerged.jf"
    _run_cli(["merge", "-o", str(our_merged)] + partials)
    assert _our_counts(our_merged) == _ref_counts(ref_oracle, ref_merged)

    # and the records agree IN ORDER (same matrix -> same hash order)
    out_ref = subprocess.run(
        [ref_oracle, "read", str(ref_merged)], check=True,
        capture_output=True,
    ).stdout.decode().splitlines()
    out_ours = _run_cli(["dump", "-c", str(our_merged)]).splitlines()
    assert [l.split() for l in out_ours] == [l.split() for l in out_ref]


def test_reference_binary_query_reads_our_db(ref_oracle, seq_files,
                                             tmp_path):
    """The reference's own binary_query backend (mmap + interpolated
    search, what `jellyfish query` runs) answers lookups on OUR canonical
    DB identically to our `query` subcommand — present mers, their
    reverse complements, and absent mers."""
    k = 21
    our_db = tmp_path / "q.jf"
    _run_cli(["count", "-m", str(k), "-s", "256k", "-C", "-o", str(our_db),
              seq_files[0]])
    recs = sorted(_our_counts(our_db).items())
    comp = str.maketrans("ACGT", "TGCA")
    sample = [m for m, _ in recs[:5] + recs[-5:] + recs[len(recs) // 2:][:5]]
    rcs = [m.translate(comp)[::-1] for m in sample[:5]]
    absent = ["A" * k, "ACGT" * 5 + "A"]
    mers = sample + rcs + absent

    ref_out = subprocess.run(
        [ref_oracle, "query", str(our_db)] + mers,
        check=True, capture_output=True,
    ).stdout.decode().split()
    our_out = [
        line.split()[1]
        for line in _run_cli(["query", str(our_db)] + mers).splitlines()
    ]
    assert ref_out == our_out
    d = dict(recs)
    assert [int(x) for x in ref_out[: len(sample)]] == [
        d[m] for m in sample
    ]


def test_reference_text_reader_reads_our_text_db(ref_oracle, seq_files,
                                                 tmp_path):
    """`count --text` output parses through the reference's own
    text_reader with identical records to the binary DB of the same
    run."""
    k = 21
    txt_db = tmp_path / "t.jf"
    bin_db = tmp_path / "b.jf"
    _run_cli(["count", "-m", str(k), "-s", "256k", "-C", "--text",
              "-o", str(txt_db), seq_files[0]])
    _run_cli(["count", "-m", str(k), "-s", "256k", "-C",
              "-o", str(bin_db), seq_files[0]])
    out = subprocess.run(
        [ref_oracle, "read-text", str(txt_db)], check=True,
        capture_output=True,
    ).stdout.decode()
    got = {}
    for line in out.splitlines():
        m, v = line.split()
        got[m] = int(v)
    assert got == _our_counts(bin_db)


def test_reference_reads_our_bloomcounter(ref_oracle, seq_files, tmp_path):
    """Our `bc` output (base-3 packed cells, two-matrix double hashing) is
    consumed by the reference's OWN mer_dna_bloom_counter (query_main.cc
    99-107) with identical saturating counts {0,1,2} for mers seen 0, 1
    and >=2 times."""
    k = 21
    bc = tmp_path / "f.bc"
    _run_cli(["bc", "-m", str(k), "-s", "200k", "-C", "-o", str(bc),
              seq_files[0]])
    # ground truth from an exact count of the same file
    db = tmp_path / "exact.jf"
    _run_cli(["count", "-m", str(k), "-s", "256k", "-C", "-o", str(db),
              seq_files[0]])
    counts = _our_counts(db)
    items = sorted(counts.items())
    singles = [m for m, c in items if c == 1][:8]
    multis = [m for m, c in items if c >= 2][:8]
    absent = ["A" * k, "CGCGCGCGCGCGCGCGCGCGC"]
    mers = singles + multis + absent

    ref_out = subprocess.run(
        [ref_oracle, "bcquery", str(bc)] + mers,
        check=True, capture_output=True,
    ).stdout.decode().split()
    got = [int(x) for x in ref_out]
    # bloom counters never undercount; false positives can only inflate
    for v, m in zip(got[: len(singles)], singles):
        assert v >= 1
    for v in got[len(singles) : len(singles) + len(multis)]:
        assert v == 2
    for v, m in zip(got[len(singles) + len(multis):], absent):
        assert v >= (2 if counts.get(m, 0) >= 2 else 0)

    # and the reference's answers equal OUR bc query answers exactly
    our_out = [
        line.split()[1]
        for line in _run_cli(["query", str(bc)] + mers).splitlines()
    ]
    assert our_out == ref_out


def test_whole_file_small_k_matches_reference(ref_oracle, seq_files,
                                              tmp_path):
    """k=7 crosses the identity-matrix regime boundary differently and
    makes heavy multiplicity (every 7-mer repeats)."""
    k = 7
    ref_db = tmp_path / "ref7.jf"
    subprocess.run(
        [ref_oracle, "count", str(ref_db), str(k), "16384", "1"]
        + seq_files,
        check=True, capture_output=True,
    )
    our_db = tmp_path / "ours7.jf"
    _run_cli(["count", "-m", str(k), "-s", "16k", "-C", "-o", str(our_db)]
             + seq_files)
    assert _our_counts(our_db) == _ref_counts(ref_oracle, ref_db)


def test_if_subset_matches_reference(ref_oracle, seq_files, tmp_path):
    """--if through the reference's OWN PRIME/UPDATE passes: allowed
    mers not present in the input must appear with count 0 (the primed
    table dumps them), counted mers keep exact counts, and non-allowed
    mers never appear."""
    k = 13
    iffile = tmp_path / "allowed.fa"
    # a slice of the real input plus reads that are absent from it
    with open(seq_files[0]) as src:
        head = "".join(src.readlines()[:10])
    iffile.write_text(
        head + ">absent1\n" + "AT" * 40 + "\n>absent2\n" + "GGGC" * 20 + "\n"
    )
    ref_db = tmp_path / "refif.jf"
    subprocess.run(
        [ref_oracle, "count-if", str(ref_db), str(k), "65536", "1",
         str(iffile), seq_files[0]],
        check=True, capture_output=True,
    )
    our_db = tmp_path / "oursif.jf"
    _run_cli(["count", "-m", str(k), "-s", "64k", "-C", "--if",
              str(iffile), "-o", str(our_db), seq_files[0]])
    ref = _ref_counts(ref_oracle, ref_db)
    ours = _our_counts(our_db)
    assert ours == ref
    assert 0 in set(ref.values())  # the scenario really exercises priming


def test_whole_file_multiword_k_matches_reference(ref_oracle, seq_files,
                                                  tmp_path):
    """k=33: three 32-bit sortkey limbs (W=3) exercise the multi-word
    sort/limb logic against the reference's own count pipeline."""
    k = 33
    ref_db = tmp_path / "ref33.jf"
    subprocess.run(
        [ref_oracle, "count", str(ref_db), str(k), "262144", "1"]
        + seq_files,
        check=True, capture_output=True,
    )
    our_db = tmp_path / "ours33.jf"
    _run_cli(["count", "-m", str(k), "-s", "256k", "-C",
              "-o", str(our_db)] + seq_files)
    assert _our_counts(our_db) == _ref_counts(ref_oracle, ref_db)
