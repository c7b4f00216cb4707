"""Randomized differential fuzzing against the reference's OWN pipeline.

tests/test_ref_differential.py checks fixed seeds/content at k=7/21; this
tier drives seeded random trials through BOTH implementations — the
reference's stream_manager -> mer_overlap_sequence_parser -> mer_iterator
-> cooperative hash_counter (compiled from /root/reference headers via
tests/ref_oracle.cc) and our CLI — over randomized structure:

  - k across every limb regime (identity-matrix small k, 1-limb, 2-limb,
    multi-word up to 100),
  - FASTA/FASTQ mixes, random read lengths (incl. shorter than k and
    empty records), multi-line wrapped FASTA, DOS line endings, lowercase
    bases, random N runs, missing trailing newline,
  - canonical and forward counting,
  - quality filtering (-Q) through the reference's whole_sequence_parser
    + mer_qual_iterator vs our staging path.

Every (mer, count) pair must agree exactly. Trials are deterministic per
seed; JF_FUZZ_TRIALS scales the count (default 6 + 3 quality trials).
"""

import os
import subprocess

import numpy as np
import pytest

from tests.test_ref_interop import LIBS, REF, ref_oracle  # noqa: F401
from tests.test_cli import run_cli

N_TRIALS = int(os.environ.get("JF_FUZZ_TRIALS", 6))

# spans the matrix regimes: identity (4^k <= size), 1-limb, 2-limb
# boundary (k=16/32 exact words), and multi-word
K_POOL = [2, 3, 5, 9, 16, 21, 31, 32, 33, 47, 64, 65, 100]


def _rand_read(rng, max_len):
    n = int(rng.integers(0, max_len))
    if n == 0:
        return ""
    p_n = float(rng.choice([0.0, 0.02, 0.15]))
    bases = np.array(list("ACGTN"))
    probs = [(1 - p_n) / 4] * 4 + [p_n]
    s = "".join(rng.choice(bases, size=n, p=probs))
    if rng.random() < 0.3:  # lowercase stretch
        i = int(rng.integers(0, n))
        j = int(rng.integers(i, n)) + 1
        s = s[:i] + s[i:j].lower() + s[j:]
    return s


def _write_fasta(path, reads, rng):
    eol = "\r\n" if rng.random() < 0.3 else "\n"
    wrap = int(rng.choice([0, 17, 60]))
    lines = []
    for i, r in enumerate(reads):
        lines.append(f">read{i} desc")
        if wrap and r:
            lines.extend(r[j : j + wrap] for j in range(0, len(r), wrap))
        else:
            lines.append(r)
    data = eol.join(lines)
    if rng.random() < 0.8:
        data += eol
    path.write_bytes(data.encode())


def _write_fastq(path, reads, rng, lo=33, hi=74):
    eol = "\r\n" if rng.random() < 0.3 else "\n"
    lines = []
    for i, r in enumerate(reads):
        q = "".join(
            chr(int(c)) for c in rng.integers(lo, hi + 1, size=len(r))
        )
        lines.extend([f"@read{i}", r, "+", q])
    data = eol.join(lines)
    if rng.random() < 0.8:
        data += eol
    path.write_bytes(data.encode())


def _ref_counts(ref_oracle, db):
    out = subprocess.run(
        [ref_oracle, "read", str(db)], check=True, capture_output=True
    ).stdout.decode()
    return {
        m: int(v) for m, v in (l.split() for l in out.splitlines())
    }


def _our_counts(capsys, db):
    out = run_cli(["dump", "-c", str(db)], capsys)
    return {
        m: int(v) for m, v in (l.split() for l in out.splitlines())
    }


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_counts_match_reference(ref_oracle, tmp_path, capsys, trial):
    rng = np.random.default_rng(900_000 + trial)
    k = int(rng.choice(K_POOL))
    canonical = bool(rng.integers(0, 2))
    n_files = int(rng.integers(1, 3 + 1))
    files = []
    for fi in range(n_files):
        reads = [
            _rand_read(rng, 260) for _ in range(int(rng.integers(1, 30)))
        ]
        if rng.random() < 0.5:
            p = tmp_path / f"f{fi}.fa"
            _write_fasta(p, reads, rng)
        else:
            p = tmp_path / f"f{fi}.fq"
            _write_fastq(p, [r for r in reads if r] or ["ACGT"], rng)
        files.append(str(p))

    ref_db = tmp_path / "ref.jf"
    subprocess.run(
        [ref_oracle, "count", str(ref_db), str(k), "65536",
         "1" if canonical else "0"] + files,
        check=True, capture_output=True,
    )
    our_db = tmp_path / "ours.jf"
    run_cli(["count", "-m", str(k), "-s", "64k", "-o", str(our_db)]
            + (["-C"] if canonical else []) + files)
    assert _our_counts(capsys, our_db) == _ref_counts(ref_oracle, ref_db), (
        f"trial={trial} k={k} canonical={canonical} files={files}"
    )


@pytest.mark.parametrize("trial", range(max(N_TRIALS // 2, 3)))
def test_fuzz_quality_filter_matches_reference(ref_oracle, tmp_path,
                                               capsys, trial):
    rng = np.random.default_rng(770_000 + trial)
    k = int(rng.choice([5, 21, 33]))
    min_q = int(rng.integers(1, 40))
    if min_q == 12:  # chr(45) == '-', which argparse would eat
        min_q = 13
    reads = [_rand_read(rng, 200) for _ in range(int(rng.integers(1, 25)))]
    reads = [r for r in reads if r] or ["ACGT"]
    fq = tmp_path / "q.fq"
    _write_fastq(fq, reads, rng)

    ref_db = tmp_path / "ref.jf"
    subprocess.run(
        [ref_oracle, "count-qual", str(ref_db), str(k), "65536", "1",
         chr(33 + min_q), str(fq)],
        check=True, capture_output=True,
    )
    our_db = tmp_path / "ours.jf"
    run_cli(["count", "-m", str(k), "-s", "64k", "-C", "-Q",
             chr(33 + min_q), "-o", str(our_db), str(fq)])
    assert _our_counts(capsys, our_db) == _ref_counts(ref_oracle, ref_db), (
        f"trial={trial} k={k} min_q={min_q}"
    )


@pytest.mark.parametrize("trial", range(max(N_TRIALS // 2, 3)))
def test_fuzz_merge_ops_match_reference(ref_oracle, tmp_path, capsys,
                                        trial):
    """Randomized --disk partials merged by BOTH implementations under
    every merge op (merge_files.cc:44-102): sum/min/max record-for-
    record equality in hash order."""
    rng = np.random.default_rng(990_000 + trial)
    k = int(rng.choice([9, 21, 33]))
    reads = [_rand_read(rng, 400) for _ in range(int(rng.integers(8, 30)))]
    reads = [r for r in reads if r] or ["ACGTACGTACGT"]
    fa = tmp_path / "m.fa"
    _write_fasta(fa, reads, rng)

    pre = tmp_path / "part.jf"
    run_cli(["count", "-m", str(k), "-s", "1k", "-C", "--disk",
             "--no-merge", "--no-unlink", "-o", str(pre), str(fa)])
    import glob

    partials = sorted(glob.glob(str(pre) + "[0-9]*"))
    if len(partials) < 2:
        pytest.skip("input too small to spill twice")

    # ref_oracle's merge harness drives merge_files with bounds [0, max],
    # so give our CLI -L 0 for min (the CLIs themselves both default a
    # min-merge to -L 1, merge_main.cc:31 == cli/dbtools.py run_merge)
    for op, flags in (("sum", []), ("min", ["-m", "-L", "0"]),
                      ("max", ["-M"])):
        ref_merged = tmp_path / f"ref_{op}.jf"
        subprocess.run(
            [ref_oracle, "merge", str(ref_merged), op] + partials,
            check=True, capture_output=True,
        )
        our_merged = tmp_path / f"our_{op}.jf"
        run_cli(["merge", "-o", str(our_merged)] + flags + partials)
        ours = _our_counts(capsys, our_merged)
        assert ours == _ref_counts(ref_oracle, ref_merged), (
            f"trial={trial} k={k} op={op} partials={len(partials)}"
        )
