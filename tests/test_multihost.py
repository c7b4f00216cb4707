"""Multi-host dryrun: REAL coordinated processes (2 x 4 virtual CPU
devices, gloo collectives over the loopback "DCN"), counting a shared
input data-parallel across hosts and assembling the dump from per-host
segment files. The assembled database must be byte-identical (past the
provenance header) to a single-process run with the same matrix."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from tests.conftest import random_dna

WORKER = textwrap.dedent("""
    import sys
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    from jellyfish_tpu.parallel.multihost import (
        init_multihost, write_local_segments
    )
    init_multihost(f"localhost:{port}", nproc, pid, platform="cpu")

    import jax
    import numpy as np
    from jellyfish_tpu.gf2 import GF2Matrix
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh
    import jax.experimental.multihost_utils as mu

    k, lsize = 21, 12
    matrix = GF2Matrix.random_invertible(
        lsize, 2 * k, np.random.default_rng(7)
    )
    mesh = make_mesh()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    counter = ShardedMerCounter(
        k, size=1 << lsize, mesh=mesh, canonical=True, matrix=matrix
    )

    chunks = np.load(f"{outdir}/chunks.npy")  # [steps, 8, L]
    local = slice(pid * 4, pid * 4 + 4)
    for step in range(chunks.shape[0]):
        counter.add_chunks(chunks[step, local])
    n = write_local_segments(counter, f"{outdir}/mh")
    mu.sync_global_devices("dump-done")
    print(f"RANK{pid}-WROTE {n}", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_multihost_two_process_dump(tmp_path):
    from jellyfish_tpu.gf2 import GF2Matrix
    from jellyfish_tpu.io.dumpers import dump_counter
    from jellyfish_tpu.io.files import DBReader
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh
    from jellyfish_tpu.parallel.multihost import assemble_db

    rng = np.random.default_rng(99)
    k, lsize, L, steps = 21, 12, 512, 2
    chunks = np.full((steps, 8, L), ord("N"), dtype=np.uint8)
    for st in range(steps):
        for p in range(8):
            s = random_dna(rng, L - 10, with_n=True).encode()
            chunks[st, p, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    np.save(tmp_path / "chunks.npy", chunks)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e.decode()[-2000:]
    assert b"RANK0-WROTE" in outs[0][0]
    assemble_db(str(tmp_path / "mh"), 2, str(tmp_path / "mh.jf"))

    # single-process (8 local virtual devices) run with the same matrix
    matrix = GF2Matrix.random_invertible(lsize, 2 * k, np.random.default_rng(7))
    counter = ShardedMerCounter(
        k, size=1 << lsize, mesh=make_mesh(), canonical=True, matrix=matrix
    )
    for st in range(steps):
        counter.add_chunks(chunks[st])
    dump_counter(counter, str(tmp_path / "single.jf"))

    def body(p):
        with open(p, "rb") as f:
            hlen = int(f.read(9))
            f.read(hlen)
            return f.read()

    assert body(tmp_path / "mh.jf") == body(tmp_path / "single.jf")
    with DBReader(str(tmp_path / "mh.jf")) as r:
        total = sum(v for _, v in r)
    assert total > 0
