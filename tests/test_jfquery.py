"""Linkable native query library (native/jfquery.cpp): the C-ABI analogue
of the reference's headers-as-library query path (binary_dumper.hpp:112-213
binary_query_base + file_header.hpp). Builds libjfquery.so with g++, opens
a CLI-produced database, and cross-checks counts/dump against the python
reader on the same file — plus a pure-C client (examples/query_client.c)."""

import ctypes
import subprocess
import sys

import numpy as np
import pytest

from jellyfish_tpu.native import build_jfquery
from tests.conftest import oracle_counts, random_dna


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    d = tmp_path_factory.mktemp("jfq")
    rng = np.random.default_rng(2718281828)
    seqs = [random_dna(rng, 400, with_n=True) for _ in range(20)]
    fa = d / "in.fa"
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))
    out = d / "out.jf"
    from jellyfish_tpu.cli import main

    main(["count", "-m", "17", "-s", "4k", "-C", "-o", str(out), str(fa)])
    return {"path": str(out), "seqs": seqs, "k": 17}


@pytest.fixture(scope="module")
def lib():
    so = build_jfquery()
    if so is None:
        pytest.skip("g++ unavailable")
    l = ctypes.CDLL(so)
    l.jf_query_open.restype = ctypes.c_void_p
    l.jf_query_open.argtypes = [ctypes.c_char_p]
    l.jf_query_close.argtypes = [ctypes.c_void_p]
    l.jf_query_error.restype = ctypes.c_char_p
    l.jf_query_k.restype = ctypes.c_uint
    l.jf_query_k.argtypes = [ctypes.c_void_p]
    l.jf_query_canonical.restype = ctypes.c_int
    l.jf_query_canonical.argtypes = [ctypes.c_void_p]
    l.jf_query_nb_records.restype = ctypes.c_uint64
    l.jf_query_nb_records.argtypes = [ctypes.c_void_p]
    l.jf_query_mer.restype = ctypes.c_int64
    l.jf_query_mer.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    l.jf_query_preload.argtypes = [ctypes.c_void_p]
    l.jf_query_record.restype = ctypes.c_int
    l.jf_query_record.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    return l


def test_native_query_counts(db, lib):
    from jellyfish_tpu.mer import MerDNA

    q = lib.jf_query_open(db["path"].encode())
    assert q, lib.jf_query_error().decode()
    try:
        assert lib.jf_query_k(q) == db["k"]
        assert lib.jf_query_canonical(q) == 1
        lib.jf_query_preload(q)
        expected = oracle_counts(db["seqs"], db["k"], True)
        assert lib.jf_query_nb_records(q) == len(expected)
        for bits, cnt in expected.items():
            mer = str(MerDNA(db["k"], bits)).encode()
            assert lib.jf_query_mer(q, mer) == cnt
        # absent + non-canonical-form lookups
        assert lib.jf_query_mer(q, b"A" * db["k"]) in (
            0, expected.get(0, 0)
        )
        assert lib.jf_query_mer(q, b"X" * db["k"]) == -1
        assert lib.jf_query_mer(q, b"ACGT") == -1  # wrong length
    finally:
        lib.jf_query_close(q)


def test_native_query_revcomp_lookup(db, lib):
    """Canonical DBs answer for either strand (mer_dna.hpp:428-431)."""
    from jellyfish_tpu.mer import MerDNA

    expected = oracle_counts(db["seqs"], db["k"], True)
    bits = next(iter(expected))
    m = MerDNA(db["k"], bits)
    rc = m.get_reverse_complement()
    q = lib.jf_query_open(db["path"].encode())
    try:
        assert lib.jf_query_mer(q, str(m).encode()) == expected[bits]
        assert lib.jf_query_mer(q, str(rc).encode()) == expected[bits]
    finally:
        lib.jf_query_close(q)


def test_native_dump_matches_reader(db, lib):
    from jellyfish_tpu.io.files import DBReader
    from jellyfish_tpu.mer import MerDNA

    py = [(str(MerDNA(db["k"], m)), c) for m, c in DBReader(db["path"])]
    q = lib.jf_query_open(db["path"].encode())
    try:
        buf = ctypes.create_string_buffer(db["k"] + 1)
        cnt = ctypes.c_uint64()
        native = []
        i = 0
        while lib.jf_query_record(q, i, buf, ctypes.byref(cnt)):
            native.append((buf.value.decode(), cnt.value))
            i += 1
    finally:
        lib.jf_query_close(q)
    assert native == py


def test_c_client_end_to_end(db, tmp_path):
    """examples/query_client.c: a pure-C consumer links and runs."""
    import os

    so = build_jfquery()
    if so is None:
        pytest.skip("g++ unavailable")
    exe = tmp_path / "query_client"
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "query_client.c",
    )
    subprocess.run(
        ["cc", f"-I{os.path.dirname(so)}", src, "-o", str(exe), so],
        check=True, capture_output=True,
    )
    from jellyfish_tpu.io.files import DBReader
    from jellyfish_tpu.mer import MerDNA

    recs = [(str(MerDNA(db["k"], m)), c) for m, c in DBReader(db["path"])]
    mer, count = recs[len(recs) // 2]
    out = subprocess.run(
        [str(exe), db["path"], mer],
        check=True, capture_output=True, text=True,
    ).stdout
    assert out.strip() == f"{mer} {count}"
    dump = subprocess.run(
        [str(exe), db["path"], "--dump"],
        check=True, capture_output=True, text=True,
    ).stdout
    lines = [tuple(l.split()) for l in dump.strip().splitlines()]
    assert lines == [(m, str(c)) for m, c in recs]
