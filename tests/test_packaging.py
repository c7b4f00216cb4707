"""Installable-library packaging (the libjellyfish-2.0 + pkg-config
analogue, Makefile.am:69-126 / jellyfish-2.0.pc.in): `make install` ships
libjfquery.so + jfquery.h + jfquery.pc, and a C client builds against the
installed tree via pkg-config."""

import os
import shutil
import subprocess

import numpy as np
import pytest

NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "jellyfish_tpu", "native",
)

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("cc") is None
    or shutil.which("pkg-config") is None,
    reason="make/cc/pkg-config unavailable",
)


@pytest.fixture(scope="module")
def prefix(tmp_path_factory):
    p = tmp_path_factory.mktemp("prefix")
    subprocess.run(
        ["make", "-C", NATIVE, "install", f"PREFIX={p}"],
        check=True, capture_output=True,
    )
    return p


def test_install_ships_lib_header_pc(prefix):
    assert (prefix / "lib" / "libjfquery.so").exists()
    assert (prefix / "include" / "jfquery.h").exists()
    pc = prefix / "lib" / "pkgconfig" / "jfquery.pc"
    assert pc.exists()
    assert f"prefix={prefix}" in pc.read_text()


def test_c_client_builds_via_pkg_config(prefix, tmp_path):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.io.dumpers import dump_counter
    from jellyfish_tpu.io.files import DBReader
    from jellyfish_tpu.mer import MerDNA

    env = dict(os.environ, PKG_CONFIG_PATH=str(prefix / "lib" / "pkgconfig"))
    flags = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "jfquery"],
        check=True, capture_output=True, text=True, env=env,
    ).stdout.split()
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "query_client.c",
    )
    exe = tmp_path / "client"
    subprocess.run(
        ["cc", src, "-o", str(exe)] + flags
        + [f"-Wl,-rpath,{prefix / 'lib'}"],
        check=True, capture_output=True,
    )

    # count a small DB and query it through the installed library
    k = 15
    c = MerCounter(k, size=1 << 10, canonical=False,
                   rng=np.random.default_rng(7))
    rng = np.random.default_rng(99)
    seq = "".join(rng.choice(list("ACGT"), size=300)) + "N"
    c.add_chunk(np.frombuffer(seq.encode(), dtype=np.uint8))
    db = tmp_path / "pkg.jf"
    dump_counter(c, str(db), counter_len_bytes=4, val_len_bits=7,
                 max_reprobe=126, cmdline=["test"])

    recs = [(str(MerDNA(k, int(m))), int(cnt)) for m, cnt in DBReader(str(db))]
    mer, cnt = recs[len(recs) // 2]
    out = subprocess.run(
        [str(exe), str(db), mer], check=True, capture_output=True, text=True,
    ).stdout
    assert out.strip() == f"{mer} {cnt}"
