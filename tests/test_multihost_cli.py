"""Multi-host CLI surface (VERDICT r3 #5): `jellyfish count --coordinator
HOST:PORT --num-processes N --process-id I` must drive the full
init_multihost -> data-parallel count -> segment dump -> rank-0 assembly
flow, producing a database byte-identical (past the provenance header) to
a single-process run with the same matrix — including when the hosts hold
UNEQUAL input volumes (step-count equalization)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import random_dna


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")


def _body(p):
    with open(p, "rb") as f:
        hlen = int(f.read(9))
        f.read(hlen)
        return f.read()


@pytest.mark.slow
def test_multihost_cli_two_process(tmp_path):
    rng = np.random.default_rng(1234)
    # unequal volumes: host 0 gets 3 sequences, host 1 gets 1 — forces
    # the padding-step equalization path
    files = []
    all_seqs = []
    for pid, n_seqs in [(0, 3), (1, 1)]:
        seqs = [random_dna(rng, 3000, with_n=True) for _ in range(n_seqs)]
        path = tmp_path / f"in{pid}.fa"
        _write_fasta(path, seqs)
        files.append(str(path))
        all_seqs.extend(seqs)

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JF_MH_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    base = [
        sys.executable, "-m", "jellyfish_tpu", "count",
        "-m", "21", "-s", "4k", "-C", "--matrix-seed", "7",
        "--chunk-len", "2048",
        "--coordinator", f"localhost:{port}", "--num-processes", "2",
    ]
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(pid), "-o",
                    str(tmp_path / "mh.jf"), files[pid]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e.decode()[-2000:]
    assert (tmp_path / "mh.jf").exists()
    assert not (tmp_path / "mh.jf.mh.part0").exists()  # unlinked

    # single-process run over ALL files with the same matrix seed
    env1 = dict(env)
    env1.pop("JF_MH_PLATFORM")
    env1["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu", "count",
         "-m", "21", "-s", "4k", "-C", "--matrix-seed", "7",
         "--chunk-len", "2048", "-o", str(tmp_path / "single.jf")] + files,
        env=env1, capture_output=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert _body(tmp_path / "mh.jf") == _body(tmp_path / "single.jf")

    # and the counts are right: histo of the assembled DB matches the
    # oracle histogram
    from collections import Counter

    from tests.conftest import oracle_counts

    expected = Counter(oracle_counts(all_seqs, 21, True).values())
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu", "histo",
         str(tmp_path / "mh.jf")],
        env=env1, capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    got = {}
    for line in r.stdout.decode().splitlines():
        c, n = line.split()
        got[int(c)] = int(n)
    assert got == dict(expected)


def test_multihost_flag_validation(tmp_path):
    import subprocess

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu", "count", "-m", "21",
         "-s", "4k", "--coordinator", "localhost:1", "x.fa"],
        env=env, capture_output=True, timeout=120,
    )
    assert r.returncode != 0
    assert b"--num-processes" in r.stderr
    # every count flag now composes with --coordinator (--disk, -L/-U,
    # --text, --bc/--bf, --sam, --if) — only the topology flags are
    # validated here


@pytest.mark.slow
def test_multihost_cli_disk_filters_text(tmp_path):
    """VERDICT r4 #4: --disk and -L/-U (and --text) compose with
    --coordinator — the 2-process spill+local-merge+assemble flow must
    be byte-equal (past provenance) to the single-process run with the
    same matrix and filters."""
    rng = np.random.default_rng(777)
    files = []
    all_seqs = []
    for pid, n_seqs in [(0, 3), (1, 2)]:
        # duplicated reads so -L 2 keeps a nontrivial subset
        seqs = [random_dna(rng, 1500, with_n=True) for _ in range(n_seqs)]
        seqs = seqs + [seqs[0]]
        path = tmp_path / f"in{pid}.fa"
        _write_fasta(path, seqs)
        files.append(str(path))
        all_seqs.extend(seqs)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JF_MH_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env1 = dict(env)
    env1.pop("JF_MH_PLATFORM")
    env1["JAX_PLATFORMS"] = "cpu"

    for extra, name in [
        (["--disk", "-L", "2"], "disk_L"),
        (["--text", "-U", "1"], "text_U"),
    ]:
        port = _free_port()
        base = [
            sys.executable, "-m", "jellyfish_tpu", "count",
            "-m", "21", "-s", "4k", "-C", "--matrix-seed", "11",
            "--chunk-len", "2048",
            "--coordinator", f"localhost:{port}", "--num-processes", "2",
        ] + extra
        out_mh = tmp_path / f"mh_{name}.jf"
        procs = [
            subprocess.Popen(
                base + ["--process-id", str(pid), "-o", str(out_mh),
                        files[pid]],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
            for pid in range(2)
        ]
        outs = [p.communicate(timeout=600) for p in procs]
        for p, (o, e) in zip(procs, outs):
            assert p.returncode == 0, e.decode()[-2000:]

        out_1 = tmp_path / f"single_{name}.jf"
        r = subprocess.run(
            [sys.executable, "-m", "jellyfish_tpu", "count",
             "-m", "21", "-s", "4k", "-C", "--matrix-seed", "11",
             "--chunk-len", "2048", "-o", str(out_1)] + extra + files,
            env=env1, capture_output=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        assert _body(out_mh) == _body(out_1), name
        assert len(_body(out_mh)) > 0, name


@pytest.mark.slow
def test_multihost_cli_bc_filter(tmp_path):
    """--bc composes with --coordinator: each process loads the bloom
    counter file and the finalize-time filter (each mer exactly once at
    its owner shard) makes the 2-process output byte-equal to the
    single-process --bc run."""
    rng = np.random.default_rng(909)
    uniq = [random_dna(rng, 1200) for _ in range(4)]
    seqs = uniq + uniq[:2]  # two repeated reads -> mers with count >= 2
    files = []
    for pid, sl in [(0, seqs[:3]), (1, seqs[3:])]:
        path = tmp_path / f"in{pid}.fa"
        _write_fasta(path, sl)
        files.append(str(path))

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JF_MH_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env1 = dict(env)
    env1.pop("JF_MH_PLATFORM")
    env1["JAX_PLATFORMS"] = "cpu"

    bcf = tmp_path / "f.bc"
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu", "bc", "-m", "15",
         "-s", "10k", "-C", "-o", str(bcf)] + files,
        env=env1, capture_output=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    port = _free_port()
    base = [
        sys.executable, "-m", "jellyfish_tpu", "count",
        "-m", "15", "-s", "4k", "-C", "--matrix-seed", "13",
        "--chunk-len", "2048", "--bc", str(bcf),
        "--coordinator", f"localhost:{port}", "--num-processes", "2",
    ]
    out_mh = tmp_path / "mh_bc.jf"
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(pid), "-o", str(out_mh),
                    files[pid]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e.decode()[-2000:]

    out_1 = tmp_path / "single_bc.jf"
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu", "count", "-m", "15",
         "-s", "4k", "-C", "--matrix-seed", "13", "--chunk-len", "2048",
         "--bc", str(bcf), "-o", str(out_1)] + files,
        env=env1, capture_output=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert _body(out_mh) == _body(out_1)
    assert len(_body(out_mh)) > 0  # the repeated reads' mers survived


@pytest.mark.slow
def test_multihost_cli_if_restriction(tmp_path):
    """--if composes with --coordinator: the lockstep PRIME pass primes
    the allowed set at owner shards (each process passes the same --if
    file), and the 2-process output is byte-equal to the single-process
    --if run over all inputs — including allowed-but-unseen mers dumping
    with count 0."""
    rng = np.random.default_rng(4242)
    seqs = [random_dna(rng, 1500) for _ in range(4)]
    files = []
    for pid, sl in [(0, seqs[:3]), (1, seqs[3:])]:
        path = tmp_path / f"in{pid}.fa"
        _write_fasta(path, sl)
        files.append(str(path))
    # allowed set: pieces of the input + some never-seen sequence
    allow = tmp_path / "allow.fa"
    _write_fasta(allow, [seqs[0][:300], seqs[3][200:600],
                         random_dna(rng, 200)])

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JF_MH_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env1 = dict(env)
    env1.pop("JF_MH_PLATFORM")
    env1["JAX_PLATFORMS"] = "cpu"

    port = _free_port()
    base = [
        sys.executable, "-m", "jellyfish_tpu", "count",
        "-m", "21", "-s", "4k", "-C", "--matrix-seed", "17",
        "--chunk-len", "2048", "--if", str(allow),
        "--coordinator", f"localhost:{port}", "--num-processes", "2",
    ]
    out_mh = tmp_path / "mh_if.jf"
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(pid), "-o", str(out_mh),
                    files[pid]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e.decode()[-2000:]

    out_1 = tmp_path / "single_if.jf"
    r = subprocess.run(
        [sys.executable, "-m", "jellyfish_tpu", "count", "-m", "21",
         "-s", "4k", "-C", "--matrix-seed", "17", "--chunk-len", "2048",
         "--if", str(allow), "-o", str(out_1)] + files,
        env=env1, capture_output=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert _body(out_mh) == _body(out_1)
    assert len(_body(out_mh)) > 0
