"""Probe: alternatives to the compact_counted sort on REAL consolidate
output shapes (sorted masked runs: unique keys ascending with PAD rows
interspersed, count on segment ends).

Baseline is the fused second sort (limbs + ~count tiebreak, ~4.3 ms/M).
Candidates:
  A. index-sort + gather: ONE u32 sort of (keep ? idx : MAX) then
     take-along for the W+1 payload arrays (gather at monotone indices —
     the 14 ms/M microbench number was RANDOM gathers; monotone may
     differ).
  B. cumsum + scatter-set with sorted unique destinations (drop mode).

Run on the chip: python experiments/compact_probe.py
Env: JF_PROBE_LOGN (default 26), JF_PROBE_KEEP (keep fraction, 0.25).
"""

import os
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

LOGN = int(os.environ.get("JF_PROBE_LOGN", 26))
KEEP = float(os.environ.get("JF_PROBE_KEEP", 0.25))
N = 1 << LOGN
KEY_BITS = 42  # k=21


def make_input(seed=7):
    """Sorted masked run: ascending unique 42-bit keys on kept rows,
    all-ones PAD elsewhere, count on kept rows."""
    rng = np.random.default_rng(seed)
    keep = rng.random(N) < KEEP
    nk = int(keep.sum())
    keys = np.unique(
        rng.integers(0, 1 << KEY_BITS, size=int(nk * 1.2), dtype=np.uint64)
    )
    if len(keys) < nk:  # astronomically unlikely at these densities
        raise RuntimeError("not enough unique keys")
    keys = keys[:nk]
    hi = np.full(N, 0xFFFFFFFF, dtype=np.uint32)
    lo = np.full(N, 0xFFFFFFFF, dtype=np.uint32)
    hi[keep] = (keys >> np.uint64(32)).astype(np.uint32)
    lo[keep] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    cnt = np.where(keep, rng.integers(1, 100, size=N), 0).astype(np.uint32)
    km = np.stack([lo, hi], axis=-1)  # [N, W] LSW..MSW like the store
    return jnp.asarray(km), jnp.asarray(cnt), nk


@jax.jit
def _probe_sum(x):
    return x.ravel()[0].astype(jnp.uint32)


def sync(*xs):
    # np.asarray(x.ravel()[:1]) on an [M, 2] array forces a 64x-padded
    # relayout copy (see merge_probe.py) — read a jitted scalar instead
    for x in xs:
        np.asarray(_probe_sum(x))


def bench(fn, args, label, n_rep=3):
    out = fn(*args)
    sync(*[o for o in (out if isinstance(out, tuple) else (out,))
           if hasattr(o, "ravel")])
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
        sync(*[o for o in (out if isinstance(out, tuple) else (out,))
               if hasattr(o, "ravel")])
    dt = (time.perf_counter() - t0) / n_rep
    print(f"{label:28s} {dt*1e3:8.1f} ms  {dt/N*1e9:6.2f} ns/row "
          f"({dt/(N/1e6)*1e3:5.2f} ms/M)")
    return out


def main():
    from jellyfish_tpu.ops.count import compact_counted

    keys, cnt, nk = make_input()
    print(f"N=2^{LOGN}  keep={KEEP} ({nk} rows)")

    @jax.jit
    def baseline(keys, cnt):
        return compact_counted(keys, cnt, None, KEY_BITS,
                               assume_masked=True)

    bench(baseline, (keys, cnt), "compact sort (baseline)")

    @jax.jit
    def idx_gather(keys, cnt):
        # separate [N] limb arrays: a [N, 2] gather output gets tiled
        # (8, 128) with the minor dim padded 2 -> 128 (64x memory)
        klo, khi = keys[:, 0], keys[:, 1]
        keep = cnt != 0
        idx = jnp.arange(N, dtype=jnp.uint32)
        tag = jnp.where(keep, idx, jnp.uint32(0xFFFFFFFF))
        (perm,) = jax.lax.sort([tag], num_keys=1, is_stable=False)
        pi = jnp.minimum(perm, jnp.uint32(N - 1)).astype(jnp.int32)
        pad = perm == jnp.uint32(0xFFFFFFFF)
        olo = jnp.where(pad, jnp.uint32(0xFFFFFFFF), klo[pi])
        ohi = jnp.where(pad, jnp.uint32(0xFFFFFFFF), khi[pi])
        oc = jnp.where(pad, 0, cnt[pi])
        return olo, ohi, oc

    bench(idx_gather, (keys, cnt), "index-sort + gather")

    @jax.jit
    def cumsum_scatter(keys, cnt):
        klo, khi = keys[:, 0], keys[:, 1]
        keep = cnt != 0
        dst = jnp.cumsum(keep.astype(jnp.int32)) - 1
        idx = jnp.where(keep, dst, N)
        kw = dict(mode="drop", unique_indices=True, indices_are_sorted=True)
        olo = jnp.full(N, 0xFFFFFFFF, dtype=jnp.uint32).at[idx].set(klo, **kw)
        ohi = jnp.full(N, 0xFFFFFFFF, dtype=jnp.uint32).at[idx].set(khi, **kw)
        oc = jnp.zeros(N, dtype=jnp.uint32).at[idx].set(cnt, **kw)
        return olo, ohi, oc

    bench(cumsum_scatter, (keys, cnt), "cumsum + sorted scatter")

    # correctness cross-check (fetch once)
    b = baseline(keys, cnt)
    g = idx_gather(keys, cnt)
    s = cumsum_scatter(keys, cnt)
    bk, bc_ = np.asarray(b[0]), np.asarray(b[1])
    for name, (olo, ohi, oc) in (("gather", g), ("scatter", s)):
        got = np.stack([np.asarray(olo), np.asarray(ohi)], axis=-1)
        assert np.array_equal(got[:nk], bk[:nk]), name
        assert np.array_equal(np.asarray(oc)[:nk], bc_[:nk]), name
    print("correctness OK (all prefixes equal)")


if __name__ == "__main__":
    main()
