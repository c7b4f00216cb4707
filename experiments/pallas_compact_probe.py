"""Chip probe: pallas gap-removal compaction (ops/pallas_compact.py) vs
the lax.sort-based compact_counted (global and rowsort-planned) on a
production-shaped masked run.

Run on the real chip: python experiments/pallas_compact_probe.py
Env: JF_PROBE_LOG2 (default 27), JF_PROBE_DENSITY (default 0.25),
     JF_PROBE_KEY_BITS (default 42), JF_PROBE_REPS (default 3).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jellyfish_tpu.ops.count import compact_counted, compaction_plan
from experiments.pallas_compact import compact_sorted_masked


@jax.jit
def _checksum(x):
    return x.ravel()[0].astype(jnp.uint32)


def _sync(out):
    np.asarray(_checksum(jax.tree.leaves(out)[0]))


def timeit(name, fn, args, reps, M):
    _sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:48s} {best*1e3/(M/1e6):7.2f} ms/M  ({best*1e3:8.1f} ms)",
          flush=True)
    return best


def main():
    log2 = int(os.environ.get("JF_PROBE_LOG2", 27))
    dens = float(os.environ.get("JF_PROBE_DENSITY", 0.25))
    key_bits = int(os.environ.get("JF_PROBE_KEY_BITS", 42))
    reps = int(os.environ.get("JF_PROBE_REPS", 3))
    M = 1 << log2
    W = (key_bits + 31) // 32

    # device-generated SORTED masked run at `dens` real fraction: draw a
    # sorted u32 base sequence, spread reals uniformly
    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 2)
        keep = jax.random.uniform(ks[0], (M,)) < dens
        base = jnp.cumsum(
            jax.random.randint(ks[1], (M,), 1, 7, jnp.uint32)
        )  # strictly increasing
        cols = [jnp.where(keep, base, jnp.uint32(0xFFFFFFFF))]
        for w in range(1, W):
            top_bits = min(32, key_bits - 32 * w)
            cols.append(jnp.where(
                keep,
                (base >> jnp.uint32(16)) & jnp.uint32((1 << (top_bits - 1)) - 1),
                jnp.uint32(0xFFFFFFFF),
            ))
        keys = jnp.stack(cols, axis=-1)
        counts = jnp.where(keep, (base & 1000) + 1, 0).astype(jnp.uint32)
        return keys, counts

    keys, counts = gen(jax.random.PRNGKey(0))
    _sync((keys, counts))
    plan = compaction_plan(1.2 * dens)
    print(f"rows=2^{log2} dens={dens} key_bits={key_bits} plan={plan}",
          flush=True)

    @jax.jit
    def f_global(ks, cs):
        return compact_counted(ks, cs, None, key_bits, assume_masked=True)[:2]

    @jax.jit
    def f_plan(ks, cs):
        return compact_counted(ks, cs, None, key_bits, assume_masked=True,
                               plan=plan)[:2]

    @jax.jit
    def f_pallas(ks, cs):
        return compact_sorted_masked(ks, cs)

    t_g = timeit("compact_counted plan=()", f_global, (keys, counts), reps, M)
    t_p = timeit(f"compact_counted plan={plan}", f_plan, (keys, counts),
                 reps, M)
    t_k = timeit("pallas compact_sorted_masked", f_pallas, (keys, counts),
                 reps, M)

    # correctness vs the sort path: same reals in the same order
    # (pallas output is 128-quantized — PADs may intersperse)
    gk, gc = jax.jit(f_global)(keys, counts)
    pk, pc, pq = f_pallas(keys, counts)
    q = int(pq)
    pk, pc = np.asarray(pk), np.asarray(pc)
    real = pc != 0
    n = int(real.sum())
    np.testing.assert_array_equal(np.asarray(gk[:n]), pk[real])
    np.testing.assert_array_equal(np.asarray(gc[:n]), pc[real])
    assert not real[q:].any()
    print(f"exact reals n={n}, quantized len q={q} ({q/max(n,1):.2f}x); "
          f"pallas speedup vs global {t_g / t_k:.2f}x, vs plan "
          f"{t_p / t_k:.2f}x", flush=True)


if __name__ == "__main__":
    main()
