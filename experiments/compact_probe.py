"""Probe: cost of consolidation pass-2 (compaction) variants on the TPU.

Current _consolidate_fn = pass1 (keys-only sort + segment lengths)
+ pass2 = compact_counted (sort [top16, lo32, ~count] num_keys=3).

Variant "rank": pass1 already yields is_new; rank = cumsum(is_new)-1 is a
dense ascending id per distinct key. Compaction = sort by rank alone
(num_keys=1, u32) with (top, lo, count) as pure payloads — 4 comparator
bytes instead of 10.

Run: JAX_PLATFORMS=tpu python experiments/compact_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 1 << 25
KEY_BITS = 42  # k=21, lsize=22 shape


def synth(seed=0):
    rng = np.random.default_rng(seed)
    # ~8x coverage: M/8 distinct keys
    distinct = M // 8
    lo = rng.integers(0, 1 << 32, size=distinct, dtype=np.uint64)
    hi = rng.integers(0, 1 << (KEY_BITS - 32), size=distinct, dtype=np.uint64)
    pool = (hi << 32) | lo
    sample = rng.choice(pool, size=M, replace=True)
    keys = np.empty((M, 2), dtype=np.uint32)
    keys[:, 0] = sample & 0xFFFFFFFF
    keys[:, 1] = sample >> 32
    # ~1% pad rows
    pad = rng.random(M) < 0.01
    keys[pad] = 0xFFFFFFFF
    return keys


def pass1(keys):
    """consolidate_premasked core (narrowed top limb)."""
    top = keys[:, 1].astype(jnp.uint16)
    lo = keys[:, 0]
    s_top, s_lo = jax.lax.sort([top, lo], num_keys=2, is_stable=False)
    neq = (s_top != jnp.roll(s_top, 1)) | (s_lo != jnp.roll(s_lo, 1))
    is_new = neq.at[0].set(True)
    idx = jnp.arange(M, dtype=jnp.int32)
    start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    is_last = jnp.roll(is_new, -1).at[M - 1].set(True)
    counts = jnp.where(is_last, (idx - start + 1).astype(jnp.uint32), 0)
    m_top = jnp.where(is_last, s_top, jnp.uint16(0xFFFF))
    m_lo = jnp.where(is_last, s_lo, jnp.uint32(0xFFFFFFFF))
    return m_top, m_lo, counts, is_new, is_last


@jax.jit
def f_pass1(keys):
    m_top, m_lo, counts, is_new, _ = pass1(keys)
    return m_top, m_lo, counts


@jax.jit
def f_cur(keys):
    """pass1 + current compact (keys + inverted count as sort keys)."""
    m_top, m_lo, counts, _, _ = pass1(keys)
    s = jax.lax.sort([m_top, m_lo, ~counts], num_keys=3, is_stable=False)
    return s[0], s[1], ~s[2]


@jax.jit
def f_rank(keys):
    """pass1 + rank-key compact (1 u32 key, 3 payloads)."""
    m_top, m_lo, counts, is_new, is_last = pass1(keys)
    rank = (jnp.cumsum(is_new.astype(jnp.uint32)) - 1)
    rank = jnp.where(is_last, rank, jnp.uint32(0xFFFFFFFF))
    s = jax.lax.sort([rank, m_top, m_lo, counts], num_keys=1, is_stable=False)
    return s[1], s[2], s[3]


jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


def bench(f, keys, n=3):
    r = f(keys)
    np.asarray(r[0][:1])  # sync
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(keys)
    np.asarray(r[0][:1])
    np.asarray(r[1][:1])
    return (time.perf_counter() - t0) / n


def main():
    keys = jnp.asarray(synth())
    for f in (f_pass1, f_cur, f_rank):  # compile + settle everything first
        bench(f, keys, n=1)
    t1 = min(bench(f_pass1, keys) for _ in range(2))
    t2 = min(bench(f_cur, keys) for _ in range(2))
    t3 = min(bench(f_rank, keys) for _ in range(2))

    def rep(name, t):
        print(f"{name:8s} {t*1e3:8.1f} ms  {t*1e9/M:6.2f} ms/M-rows... ns/row")

    rep("pass1", t1)
    rep("cur", t2)
    rep("rank", t3)
    print(f"compact cur : {(t2-t1)*1e9/M:6.2f} ns/row")
    print(f"compact rank: {(t3-t1)*1e9/M:6.2f} ns/row")


if __name__ == "__main__":
    main()
