"""Does the [N, W] row-major key layout tax the consolidate sort?

The pipeline materializes raw runs as [N, W] u32 (limbs in the minor
dim); consolidate_premasked column-slices them (keys[:, W-1-w]) before
lax.sort. PERF.md records 1.5-3 ms/M for [M, W] <-> [W, M] relayouts —
if the column slices pay that, keeping runs LIMB-MAJOR (W separate
arrays) end-to-end would save it.

Arms (real chip, 2^26 rows, W=3):
  a) sort column slices of one [M, 3] array      (current store layout)
  b) sort 3 pre-split contiguous [M] arrays      (limb-major layout)
  c) pipeline-output emulation: stack + the sort (what a chunk pays now)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

M = 1 << int(os.environ.get("JF_PROBE_LOG2", 26))
W = int(os.environ.get("JF_PROBE_W", 3))


@jax.jit
def _checksum(x):
    return x.ravel()[0].astype(jnp.uint32)


def sync(out):
    np.asarray(_checksum(jax.tree.leaves(out)[0]))


def timeit(name, fn, args, reps=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3/(M/1e6):6.2f} ms/M ({best*1e3:7.1f} ms)",
          flush=True)


@jax.jit
def gen(key):
    return jax.random.bits(key, (M, W), dtype=jnp.uint32)


@jax.jit
def gen_limbs(key):
    ks = jax.random.split(key, W)
    return tuple(jax.random.bits(k, (M,), dtype=jnp.uint32) for k in ks)


@jax.jit
def sort_rowmajor(keys):
    limbs = [keys[:, W - 1 - w] for w in range(W)]
    return jax.lax.sort(limbs, num_keys=W, is_stable=False)


@jax.jit
def sort_limbmajor(*limbs):
    return jax.lax.sort(list(limbs), num_keys=W, is_stable=False)


@jax.jit
def stack_then_sort(*limbs):
    keys = jnp.stack(list(limbs), axis=-1)  # what the pipeline emits
    cols = [keys[:, W - 1 - w] for w in range(W)]
    return jax.lax.sort(cols, num_keys=W, is_stable=False)


def main():
    keys = gen(jax.random.PRNGKey(0))
    sync((keys,))
    limbs = gen_limbs(jax.random.PRNGKey(0))
    sync(limbs)
    timeit("a) sort column slices of [M, W]", sort_rowmajor, (keys,))
    timeit("b) sort W contiguous [M] limb arrays", sort_limbmajor, limbs)
    timeit("c) stack to [M, W] then slice + sort", stack_then_sort, limbs)


if __name__ == "__main__":
    main()
