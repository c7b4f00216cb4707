"""Multi-chip sharded counting on the virtual 8-device CPU mesh, checked
against the host oracle (the reference's test style, see conftest)."""

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna


def _chunks_from_seqs(seqs, P, L):
    """One read per shard row, padded with 'N' separators."""
    chunks = np.full((P, L), ord("N"), dtype=np.uint8)
    for i, s in enumerate(seqs):
        b = s.encode()
        chunks[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return chunks


@pytest.mark.parametrize("k,canonical", [(21, False), (21, True), (33, True)])
def test_sharded_matches_oracle(rng, k, canonical):
    import jax

    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    assert P == 8
    mesh = make_mesh()
    seqs = [random_dna(rng, 400, with_n=True) for _ in range(P * 3)]

    counter = ShardedMerCounter(k, size=1 << 14, mesh=mesh, canonical=canonical, rng=rng)
    for i in range(0, len(seqs), P):
        counter.add_chunks(_chunks_from_seqs(seqs[i : i + P], P, 512))
    mers, counts = counter.finalize()

    expected = oracle_counts(seqs, k, canonical)
    got = {int(m): int(c) for m, c in zip(mers, counts)}
    assert got == expected


def test_sharded_packed_matches_oracle(rng):
    import jax

    from jellyfish_tpu.native import pack_chunk
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    mesh = make_mesh()
    k = 21
    seqs = [random_dna(rng, 400, with_n=True) for _ in range(P * 2)]
    counter = ShardedMerCounter(k, size=1 << 14, mesh=mesh, canonical=True,
                                rng=rng)
    for i in range(0, len(seqs), P):
        chunks = _chunks_from_seqs(seqs[i : i + P], P, 512)
        packed = [pack_chunk(c) for c in chunks]
        pw = np.stack([p[0] for p in packed])
        vb = np.stack([p[1] for p in packed])
        counter.add_chunks_packed(pw, vb)
    mers, counts = counter.finalize()
    got = {int(m): int(c) for m, c in zip(mers, counts)}
    assert got == oracle_counts(seqs, k, True)


def test_sharded_order_is_global_hash_order(rng):
    import jax

    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    k = 15
    mesh = make_mesh()
    counter = ShardedMerCounter(k, size=1 << 12, mesh=mesh, canonical=False, rng=rng)
    seqs = [random_dna(rng, 300) for _ in range(8)]
    counter.add_chunks(_chunks_from_seqs(seqs, 8, 512))
    mers, _ = counter.finalize()
    m = counter.matrix
    mask = counter.size - 1
    pairs = [(m.times(int(x)) & mask, int(x)) for x in mers]
    assert pairs == sorted(pairs)


def test_sharded_raw_merge_at_large_total_weight(rng):
    """Regression: raw level-0 groups must go through the segment-length
    kernel even once total ingested weight exceeds 2^32 — routing them
    through merge_many (bounded log-scan) silently undercounts any mer
    occurring more than n_runs times in a group."""
    import jax

    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    mesh = make_mesh()
    k = 21
    # one homopolymer-ish read repeated in every chunk: a single mer occurs
    # far more than branch(=8) times per merge group
    seq = "AC" * 40
    counter = ShardedMerCounter(k, size=1 << 12, mesh=mesh, canonical=False,
                                rng=rng)
    counter.store.total_weight = 1 << 33  # simulate a >4G-base ingest
    for _ in range(counter.store.branch):
        counter.add_chunks(_chunks_from_seqs([seq] * P, P, 128))
    mers, counts = counter.finalize()
    expected = oracle_counts([seq] * (P * counter.store.branch), k, False)
    got = {int(m): int(c) for m, c in zip(mers, counts)}
    assert got == expected


def test_sharded_dump_byte_identical_to_single_chip(rng, tmp_path):
    """8-device count dumps a DB byte-identical (minus provenance header)
    to the single-chip dump with the same matrix — the sharded dump path
    really is the reference's global (pos, key) order."""
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.gf2 import GF2Matrix
    from jellyfish_tpu.io.dumpers import dump_counter
    from jellyfish_tpu.io.files import DBReader
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    k, lsize = 21, 13
    matrix = GF2Matrix.random_invertible(lsize, 2 * k, rng)
    seqs = [random_dna(rng, 600, with_n=True) for _ in range(16)]

    sc = ShardedMerCounter(k, size=1 << lsize, mesh=make_mesh(),
                           canonical=True, matrix=matrix)
    for i in range(0, len(seqs), 8):
        sc.add_chunks(_chunks_from_seqs(seqs[i : i + 8], 8, 768))
    db_s = tmp_path / "sharded.jf"
    dump_counter(sc, str(db_s))

    mc = MerCounter(k, size=1 << lsize, canonical=True, matrix=matrix)
    for s in seqs:
        mc.add_chunk(np.frombuffer(s.encode(), dtype=np.uint8))
    db_1 = tmp_path / "single.jf"
    dump_counter(mc, str(db_1))

    with DBReader(str(db_s)) as r:
        recs_s = list(r)
    with DBReader(str(db_1)) as r:
        recs_1 = list(r)
    assert recs_s == recs_1
    # record payload past the (provenance-bearing) headers is byte-equal
    def body(p):
        with open(p, "rb") as f:
            hlen = int(f.read(9))
            f.read(hlen)  # header JSON + pad differs only in provenance
            return f.read()

    assert body(db_s) == body(db_1)


def test_cli_count_devices(tmp_path, monkeypatch):
    """`count --devices 8` end-to-end through the CLI produces the same
    counts as the single-chip CLI run (histo/dump text equality)."""
    import subprocess
    import sys

    fa = tmp_path / "in.fa"
    rng = np.random.default_rng(77)
    seqs = [random_dna(rng, 500, with_n=True) for _ in range(12)]
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))

    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    def run_count(out, devices):
        r = subprocess.run(
            [sys.executable, "-m", "jellyfish_tpu", "count", "-m", "21",
             "-s", "16k", "-C", "-d", devices, "-o", str(out), str(fa)],
            env=env, capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        d = subprocess.run(
            [sys.executable, "-m", "jellyfish_tpu", "dump", "-c", str(out)],
            env=env, capture_output=True, text=True, cwd="/root/repo",
        )
        assert d.returncode == 0, d.stderr
        return sorted(d.stdout.splitlines())

    assert run_count(tmp_path / "o8.jf", "8") == run_count(
        tmp_path / "o1.jf", "1"
    )


def test_cli_count_devices_if_restriction(tmp_path):
    """`count -d 8 --if allow.fa` matches the single-chip --if run
    byte-for-byte (incl. primed-but-unseen mers at count 0)."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(5)
    fa = tmp_path / "in.fa"
    seqs = [random_dna(rng, 400, with_n=True) for _ in range(8)]
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))
    allow = tmp_path / "allow.fa"
    # overlaps the input plus some unseen mers (must dump at 0)
    allow.write_text(f">a0\n{seqs[0][:80]}\n>a1\n{random_dna(rng, 60)}\n")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    def run_count(out, devices):
        r = subprocess.run(
            [sys.executable, "-m", "jellyfish_tpu", "count", "-m", "15",
             "-s", "16k", "-C", "-d", devices, "--if", str(allow),
             "-o", str(out), str(fa)],
            env=env, capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        d = subprocess.run(
            [sys.executable, "-m", "jellyfish_tpu", "dump", "-c", str(out)],
            env=env, capture_output=True, text=True, cwd="/root/repo",
        )
        assert d.returncode == 0, d.stderr
        return sorted(d.stdout.splitlines())

    got8 = run_count(tmp_path / "i8.jf", "8")
    got1 = run_count(tmp_path / "i1.jf", "1")
    assert got8 == got1
    assert any(line.endswith(" 0") for line in got8)  # primed-unseen
    assert any(not line.endswith(" 0") for line in got8)

    # --if + --disk + -d: spills re-finalize the sharded restrict store
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu", "count", "-m", "15",
         "-s", "1k", "-C", "-d", "8", "--disk", "--if", str(allow),
         "-o", str(tmp_path / "id8.jf"), str(fa)],
        env=env, capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    d = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu", "dump", "-c",
         str(tmp_path / "id8.jf")],
        env=env, capture_output=True, text=True, cwd="/root/repo",
    )
    assert sorted(d.stdout.splitlines()) == got8


def test_cli_count_devices_disk_spill(tmp_path):
    """`count -d 8 --disk` with a tiny -s (forcing spills + merge)
    matches the single-chip in-memory run."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(9)
    fa = tmp_path / "in.fa"
    seqs = [random_dna(rng, 600) for _ in range(10)]
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    def run(out, extra):
        r = subprocess.run(
            [sys.executable, "-m", "jellyfish_tpu", "count", "-m", "15",
             "-C", "-o", str(out)] + extra + [str(fa)],
            env=env, capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        d = subprocess.run(
            [sys.executable, "-m", "jellyfish_tpu", "dump", "-c", str(out)],
            env=env, capture_output=True, text=True, cwd="/root/repo",
        )
        assert d.returncode == 0, d.stderr
        return sorted(d.stdout.splitlines())

    spill = run(tmp_path / "d8.jf", ["-d", "8", "--disk", "-s", "1k"])
    plain = run(tmp_path / "d1.jf", ["-d", "1", "-s", "64k"])
    assert spill == plain and len(spill) > 1000


def _run_jf(args, env, cwd="/root/repo"):
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "-m", "jellyfish_tpu"] + args,
                       env=env, capture_output=True, text=True, cwd=cwd)
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_cli_count_devices_bloom_modes(tmp_path):
    """`count -d 8 --bc` matches single-chip byte-for-byte (same
    prebuilt bloom counter file => identical stateless filter); `-d 8
    --bf-size` satisfies the one-pass mode's guarantees vs the exact
    oracle (counts c or c-1; every multi-occurrence mer present)."""
    import os

    from tests.conftest import oracle_counts

    rng = np.random.default_rng(31)
    fa = tmp_path / "in.fa"
    uniq = [random_dna(rng, 700) for _ in range(4)]
    seqs = uniq + uniq[:2]  # repeated reads -> mers with count >= 2
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    bcf = tmp_path / "f.bc"
    _run_jf(["bc", "-m", "15", "-s", "10k", "-C", "-o", str(bcf),
             str(fa)], env)

    def dump(out):
        return sorted(_run_jf(["dump", "-c", str(out)], env).splitlines())

    for d in ("8", "1"):
        _run_jf(["count", "-m", "15", "-s", "16k", "-C", "-d", d,
                 "--bc", str(bcf), "-o", str(tmp_path / f"bc{d}.jf"),
                 str(fa)], env)
    got8 = dump(tmp_path / "bc8.jf")
    assert got8 == dump(tmp_path / "bc1.jf")
    assert got8  # the bc pass kept the repeated mers

    _run_jf(["count", "-m", "15", "-s", "16k", "-C", "-d", "8",
             "--bf-size", "10k", "--bf-fp", "0.001",
             "-o", str(tmp_path / "bf8.jf"), str(fa)], env)
    from jellyfish_tpu.mer import MerDNA

    full = {str(MerDNA(15, bits)): c
            for bits, c in oracle_counts(seqs, 15, True).items()}
    got = dict(line.rsplit(" ", 1)
               for line in dump(tmp_path / "bf8.jf"))
    got = {m: int(c) for m, c in got.items()}
    for m, c in full.items():
        if c >= 2:  # must be present, first occurrence maybe consumed
            assert got.get(m) in (c, c - 1), m
    for m, c in got.items():
        assert c in (full[m], full[m] - 1) and c > 0


def test_sharded_restrict_matches_oracle(rng):
    """ShardedMerCounter.restrict_to vs a dict oracle on an 8-device
    CPU mesh: output = primed set with counted values / zeros."""
    import jax

    from jellyfish_tpu.mer import string_canonicals
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    k = 13
    seq = random_dna(rng, 3000, with_n=True)
    allowed_seq = seq[100:220] + random_dna(rng, 50)

    counter = ShardedMerCounter(
        k, size=1 << 12, mesh=make_mesh(P), canonical=True,
        rng=np.random.default_rng(11),
    )
    L = 512
    chunks = []
    for off in range(0, len(seq), L - (k - 1)):
        part = seq[off:off + L]
        if len(part) < k:
            break
        chunks.append(np.frombuffer(
            part.ljust(L, "N").encode(), dtype=np.uint8))
    for i in range(0, len(chunks), P):
        batch = chunks[i:i + P]
        while len(batch) < P:
            batch.append(np.full(L, ord("N"), dtype=np.uint8))
        counter.add_chunks(np.stack(batch))
    counter.restrict_to([np.frombuffer(allowed_seq.encode(),
                                       dtype=np.uint8)])
    mers, counts = counter.finalize()

    full = {}
    for m in string_canonicals(seq, k):
        full[str(m)] = full.get(str(m), 0) + 1
    want = {m: full.get(m, 0)
            for m in {str(x) for x in string_canonicals(allowed_seq, k)}}
    from jellyfish_tpu.mer import MerDNA
    got = {str(MerDNA(k, int(m))): int(c) for m, c in zip(mers, counts)}
    assert got == want
    assert 0 in got.values() and any(v > 0 for v in got.values())


def test_compact_exchange_matches_masked(rng):
    """The compact (sorted segments + tiled all-to-all) exchange and the
    capacity-free masked exchange produce identical tables, and the
    compact path's per-step ingest volume is ~N(1+1/4), not P*N."""
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh
    from jellyfish_tpu.parallel.sharded import _exchange_cap

    k = 21
    L = 1 << 16  # large enough that the constant capacity margin is small
    seqs = [random_dna(rng, L - 20, with_n=True) for _ in range(8)]
    counters = {}
    for compact in (True, False):
        c = ShardedMerCounter(
            k, size=1 << 13, mesh=make_mesh(), canonical=True,
            rng=np.random.default_rng(5), compact_exchange=compact,
        )
        c.add_chunks(_chunks_from_seqs(seqs, 8, L))
        counters[compact] = c
    # shape accounting: level-0 run rows per step
    run_c = counters[True].store.occupied_runs()[0][0]
    run_m = counters[False].store.occupied_runs()[0][0]
    assert run_c.shape[1] == 8 * _exchange_cap(run_m.shape[1] // 8, 8)
    assert run_c.shape[1] < run_m.shape[1] // 3  # ~4x smaller at P=8
    a = dict(zip(*counters[True].finalize()))
    b = dict(zip(*counters[False].finalize()))
    assert {int(m): int(v) for m, v in a.items()} == {
        int(m): int(v) for m, v in b.items()
    }


def test_exchange_overflow_recovered(rng):
    """A segment-capacity overflow RECOVERS instead of silently dropping
    rows or raising (forced here by shrinking the capacity margin to
    ~zero): the step is zeroed on device and replayed through the
    capacity-free masked exchange. Adversarial skew is covered by
    tests/test_overflow_retry.py."""
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh
    from jellyfish_tpu.parallel import sharded as sh

    orig = sh._exchange_cap
    sh._exchange_cap = lambda N, P: max(N // P // 8, 1)  # force overflow
    try:
        c = ShardedMerCounter(
            21, size=1 << 13, mesh=make_mesh(), canonical=True,
            rng=np.random.default_rng(5),
        )
        seqs = [random_dna(rng, 400) for _ in range(8)]
        c.add_chunks(_chunks_from_seqs(seqs, 8, 512))
        mers, counts = c.finalize()
        assert c.overflow_retries > 0
        got = {int(m): int(v) for m, v in zip(mers, counts)}
        assert got == oracle_counts(seqs, 21, True)
    finally:
        sh._exchange_cap = orig


@pytest.mark.parametrize("P", [3, 5, 6])
def test_sharded_non_pow2_mesh(rng, P):
    """Non-power-of-two shard counts: the monotone multiply-shift owner
    map must route every mer to a live shard (a log2-prefix owner would
    route to 2^ceil_log2(P) destinations and silently drop rows) and the
    output must stay in global hash order."""
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    k = 15
    mesh = make_mesh(P)
    seqs = [random_dna(rng, 300, with_n=True) for _ in range(P * 2)]
    counter = ShardedMerCounter(
        k, size=1 << 12, mesh=mesh, canonical=True, rng=rng
    )
    for i in range(0, len(seqs), P):
        counter.add_chunks(_chunks_from_seqs(seqs[i : i + P], P, 384))
    mers_np, counts = counter.finalize_np()

    got = {}
    from jellyfish_tpu.ops import multiword as mw

    for m, c in zip(mw.to_ints(mers_np), counts):
        got[int(m)] = int(c)
    assert got == oracle_counts(seqs, k, True)

    # global hash order: ascending sortkeys across the shard concatenation
    from jellyfish_tpu.ops.hashing import sortkey_of_mers
    import jax.numpy as jnp

    sk = np.asarray(
        sortkey_of_mers(
            jnp.asarray(mers_np), counter._A, counter.k, counter.lsize
        )
    )
    vals = [int.from_bytes(row.tobytes(), "little") for row in sk]
    assert vals == sorted(vals)


def test_sharded_homopolymer_no_overflow(rng):
    """Pathological repeat content: every window of a poly-A chunk is the
    same mer, so ALL rows route to one owner. The raw compact exchange
    used to overflow its per-destination capacity and raise; with
    deduplicated (key, count) segments the hot key collapses to one row
    and counting succeeds exactly."""
    import jax

    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(jax.devices())
    k = 15
    counter = ShardedMerCounter(
        k, size=1 << 12, mesh=make_mesh(), canonical=False,
        rng=np.random.default_rng(5),
    )
    seqs = ["A" * 4096] * P + ["ACGT" * 1024] * P
    for i in range(0, len(seqs), P):
        counter.add_chunks(_chunks_from_seqs(seqs[i : i + P], P, 4200))
    mers, counts = counter.finalize()
    got = {int(m): int(c) for m, c in zip(mers, counts)}
    assert got == oracle_counts(seqs, k, False)


def test_sharded_bloom_ingest_memory_bounded(rng):
    """VERDICT r3 #4: under -d the bloom filter must apply at INGEST
    (per-chunk, before the exchange) so --bc/--bf-size bound device
    memory like single-chip — the store may only ever hold PASSING mers.
    A filter that drops everything must leave the sharded store ~empty
    while the unfiltered run accumulates every distinct mer; outputs of
    a keep-some filter stay identical to finalize-time filtering."""
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    k = 15
    seqs = [random_dna(rng, 2000) for _ in range(16)]

    def chunks_of(i):
        batch = np.full((8, 2048), ord("N"), dtype=np.uint8)
        for p in range(8):
            s = seqs[(2 * i + p) % len(seqs)]
            batch[p, : len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)
        return batch

    def drop_all(mers, counts):
        return np.zeros_like(counts)

    sizes = {}
    for name, filt in [("drop", drop_all), ("none", None)]:
        c = ShardedMerCounter(
            k, size=1 << 14, mesh=make_mesh(8), canonical=True,
            rng=np.random.default_rng(6), mer_filter=filt,
        )
        if filt is not None:
            assert c._ingest_filter
        c.store.branch = 2  # cascade to the shrinking levels quickly
        for i in range(8):
            c.add_chunks(chunks_of(i))
        sizes[name] = c.store.device_bytes()
    # a drop-all ingest filter must leave (near-)nothing resident; the
    # unfiltered store holds every distinct mer
    assert sizes["drop"] < sizes["none"] / 3, sizes  # drop-all bottoms at the 1024-row min cap

    # keep-some filter: ingest-time filtering == finalize-time filtering
    from tests.conftest import oracle_counts

    oc = oracle_counts(seqs, k, True)
    keep_set = {m for m, v in oc.items() if (m & 3) == 0}

    def keep_some(mers, counts):
        from jellyfish_tpu.ops import multiword as mw

        out = np.zeros_like(counts)
        sel = counts > 0
        ints = mw.to_ints(mers[sel])
        keep = np.array([int(x) in keep_set for x in ints], dtype=bool)
        out[sel] = np.where(keep, counts[sel], 0)
        return out

    res = {}
    for mode in ("ingest", "finalize"):
        c = ShardedMerCounter(
            k, size=1 << 14, mesh=make_mesh(8), canonical=True,
            rng=np.random.default_rng(6), mer_filter=keep_some,
        )
        if mode == "finalize":
            c._ingest_filter = False
        for i in range(4):
            c.add_chunks(chunks_of(i))
        mers, counts = c.finalize()
        res[mode] = {int(m): int(v) for m, v in zip(mers, counts)}
    assert res["ingest"] == res["finalize"]
    assert res["ingest"]  # nonempty
