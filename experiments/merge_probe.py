"""Probe merge_many / compact_counted / consolidate_premasked cost vs rows
on the real chip (fetch-forced syncs). Informs the level-0 compaction policy:
is the branch merge's cost/row flat in size, or does it blow up at 2^28?"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.ops.count import (
    compact_counted,
    consolidate_premasked,
    merge_many,
)

KEY_BITS = 42  # k=21
W = 2

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


@jax.jit
def _probe_sum(x):
    return x.ravel()[0].astype(jnp.uint32)


def sync(x):
    # NOTE: np.asarray(arr.ravel()[:1]) on an [M, 2] array forces a
    # relayout copy padded 64x (T(8,128) minor-dim padding) and OOMs HBM;
    # a jitted scalar read fuses and fetches 4 bytes
    np.asarray(_probe_sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, *args, reps=3):
    fn(*args)  # warm
    sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        sync(o)
    return (time.perf_counter() - t0) / reps


def make_masked_run(M, density, seed):
    """Masked counted run: ~density*M real rows (sorted keys), rest PAD."""
    rng = np.random.default_rng(seed)
    n = int(M * density)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    hi = rng.integers(0, 1 << (KEY_BITS - 32), size=n, dtype=np.uint64).astype(np.uint32)
    keys = np.full((M, W), 0xFFFFFFFF, dtype=np.uint32)
    order = np.lexsort((lo, hi))
    pos = np.sort(rng.choice(M, size=n, replace=False))
    keys[pos, 0] = lo[order]
    keys[pos, 1] = hi[order]
    counts = np.zeros(M, dtype=np.uint32)
    counts[pos] = rng.integers(1, 100, size=n, dtype=np.int64).astype(np.uint32)
    return jnp.asarray(keys), jnp.asarray(counts)


@jax.jit
def _merge8(*args):
    ks = jnp.concatenate(args[0::2], axis=0)
    cs = jnp.concatenate(args[1::2], axis=0)
    return merge_many(ks, cs, None, max_dups=8, compact=True, key_bits=KEY_BITS)


@jax.jit
def _compact(k, c):
    return compact_counted(k, c, None, KEY_BITS, assume_masked=True)


@jax.jit
def _consol(k):
    return consolidate_premasked(k, KEY_BITS)


def main():
    print("rows_total  op               ms     ms/M")
    for logM in (22, 23, 24, 25):
        M = 1 << logM  # per-run rows; merge total = 8*M
        runs = [make_masked_run(M, 0.4, s) for s in range(8)]
        args = [x for r in runs for x in r]
        t = timeit(_merge8, *args)
        tot = 8 * M
        print(f"{tot:>10}  merge_many(8x)  {t*1e3:8.1f}  {t*1e3/(tot/1e6):6.2f}")
        big_k = jnp.concatenate([r[0] for r in runs], axis=0)
        big_c = jnp.concatenate([r[1] for r in runs], axis=0)
        t = timeit(_compact, big_k, big_c)
        print(f"{tot:>10}  compact_counted {t*1e3:8.1f}  {t*1e3/(tot/1e6):6.2f}")
        t = timeit(_consol, big_k)
        print(f"{tot:>10}  consolidate     {t*1e3:8.1f}  {t*1e3/(tot/1e6):6.2f}")


if __name__ == "__main__":
    main()
