"""Measure lax.sort throughput vs size + candidate compaction primitives
on the real chip (fetch-forced syncs; block_until_ready unreliable via the
axon tunnel). Informs the store's consolidation/compaction policy."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


def sync(x):
    if isinstance(x, (tuple, list)):
        x = x[0]
    np.asarray(jax.device_put(x[..., :1] if x.ndim else x))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    print("dev:", jax.devices())
    rng = np.random.default_rng(0)

    # keys-only consolidation-shaped sort: u16 top limb + u32 low limb (k=21)
    @jax.jit
    def sort2(hi16, lo32):
        s = jax.lax.sort([hi16, lo32], num_keys=2, is_stable=False)
        return s[0]

    # consolidation full kernel shape: sort + segment marks + counts
    @jax.jit
    def consolidate(hi16, lo32):
        s = jax.lax.sort([hi16, lo32], num_keys=2, is_stable=False)
        M = hi16.shape[0]
        neq = (s[0] != jnp.roll(s[0], 1)) | (s[1] != jnp.roll(s[1], 1))
        is_new = neq.at[0].set(True)
        idx = jnp.arange(M, dtype=jnp.int32)
        start = jax.lax.cummax(jnp.where(is_new, idx, 0))
        is_last = jnp.roll(is_new, -1).at[M - 1].set(True)
        counts = jnp.where(is_last, (idx - start + 1).astype(jnp.uint32), 0)
        return s[0], s[1], counts

    # compaction-shaped sort: 2 key limbs + inverted count as 3rd key
    @jax.jit
    def sort3(hi16, lo32, cnt):
        s = jax.lax.sort([hi16, lo32, ~cnt], num_keys=3, is_stable=False)
        return s[0]

    # monotonic gather compaction: indices ascending
    @jax.jit
    def mono_gather(hi16, lo32, cnt, idx):
        return hi16[idx], lo32[idx], cnt[idx]

    for logn in (20, 23, 24, 25, 26):
        n = 1 << logn
        hi16 = jnp.asarray(rng.integers(0, 1 << 10, n, dtype=np.uint16))
        lo32 = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
        cnt = jnp.asarray(rng.integers(1, 100, n, dtype=np.uint32))
        # monotonic indices: keep ~half, sorted
        idx = jnp.asarray(
            np.sort(rng.choice(n, size=n // 2, replace=False)).astype(np.int32)
        )
        t_sort = timeit(sort2, hi16, lo32)
        t_cons = timeit(consolidate, hi16, lo32)
        t_sort3 = timeit(sort3, hi16, lo32, cnt)
        t_g = timeit(mono_gather, hi16, lo32, cnt, idx)
        print(
            f"n=2^{logn}: sort2 {t_sort*1e3:7.1f}ms ({n/t_sort/1e6:6.0f}M/s)"
            f"  consolidate {t_cons*1e3:7.1f}ms ({n/t_cons/1e6:6.0f}M/s)"
            f"  sort3 {t_sort3*1e3:7.1f}ms ({n/t_sort3/1e6:6.0f}M/s)"
            f"  mono-gather(n/2) {t_g*1e3:7.1f}ms ({n/2/t_g/1e6:6.0f}M/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
