"""Merge-path Pallas kernel logic regression (experiments/
pallas_merge_probe.py) in interpret mode: the kernel that beats
lax.sort 2-3.5x on chip must keep producing exact merges — validated
platform-independently so the CPU suite guards it."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "experiments"))


@pytest.fixture(scope="module")
def probe(monkeypatch_module=None):
    os.environ["JF_PALLAS_INTERPRET"] = "1"
    import pallas_merge_probe as m
    assert m.INTERPRET
    return m


def test_merge_path_single_operand_exact(probe, rng):
    import jax.numpy as jnp

    n = probe.T_OUT * 3  # 3 tiles, exercises split quantization deltas
    A = np.sort(rng.integers(0, 1 << 32, n // 2, dtype=np.uint32))
    B = np.sort(rng.integers(0, 1 << 32, n - n // 2, dtype=np.uint32))
    f = probe.build_merge(3, n)
    got = np.asarray(f(jnp.asarray(A), jnp.asarray(B)))
    want = np.sort(np.concatenate([A, B]), kind="stable")
    assert (got == want).all()


def test_merge_path_full_operands_exact(probe, rng):
    import jax.numpy as jnp

    n = probe.T_OUT * 2
    ka = np.unique(rng.integers(0, 1 << 63, n // 2 + 200,
                                dtype=np.uint64))[: n // 2]
    kb = np.unique(rng.integers(0, 1 << 63, n // 2 + 200,
                                dtype=np.uint64))[: n // 2]
    pays = [rng.integers(0, 1 << 31, n // 2, dtype=np.uint32)
            for _ in range(4)]
    f = probe.build_merge_n(2, n, 2)
    dev = [jnp.asarray(x) for x in (
        (ka >> 32).astype(np.uint32), ka.astype(np.uint32),
        pays[0], pays[1],
        (kb >> 32).astype(np.uint32), kb.astype(np.uint32),
        pays[2], pays[3],
    )]
    oh, ol, oc0, oc1 = (np.asarray(x) for x in f(*dev))
    allk = np.concatenate([ka, kb])
    order = np.argsort(allk, kind="stable")
    assert (oh == (allk[order] >> 32).astype(np.uint32)).all()
    assert (ol == allk[order].astype(np.uint32)).all()
    assert (oc0 == np.concatenate([pays[0], pays[2]])[order]).all()
    assert (oc1 == np.concatenate([pays[1], pays[3]])[order]).all()
