"""Why the rowsort compaction is SPECULATIVE (host-side ovf check) and
not self-healing on device: measure the cost of wrapping the fallback in
a lax.cond that holds BOTH branches (the round-3 design that was removed)
against the speculative plan (ovf returned, caller recomputes) and the
plan-free global sort.

The cond variant pays for the unselected branch's live buffers and the
lost fusion across the cond boundary — measured ~+2.5 ms/M over the bare
speculative plan on the real chip at 2^27 rows (the "cond probe" cited in
ops/count.py compaction_plan notes).

Run on the real chip: python experiments/cond_fallback_probe.py
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

from jellyfish_tpu.ops.count import (
    _compact_sort, _narrow_top, compaction_plan,
)


def _gen_masked(M, W, dens, key_bits, seed=0):
    """Masked counted run at `dens` real fraction, hash-spread."""
    rng = np.random.default_rng(seed)
    n = int(M * dens)
    pos = rng.choice(M, size=n, replace=False)
    keys = np.full((M, W), 0xFFFFFFFF, dtype=np.uint32)
    top_mask = (1 << (key_bits - 32 * (W - 1))) - 1
    for w in range(W):
        keys[pos, w] = rng.integers(0, 1 << 32, size=n, dtype=np.uint64
                                    ).astype(np.uint32)
    keys[pos, W - 1] &= np.uint32(top_mask // 2)
    lo = np.zeros(M, dtype=np.uint32)
    lo[pos] = rng.integers(1, 1000, size=n).astype(np.uint32)
    return jnp.asarray(keys), jnp.asarray(lo)


@jax.jit
def _checksum(x):
    return x.ravel()[0].astype(jnp.uint32)


def _sync(out):
    # block_until_ready alone does not force execution through the axon
    # tunnel; fetching a scalar does (same pattern as fused_plan_probe)
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
    keys, lo = _gen_masked(M, W, dens, key_bits)
    plan = compaction_plan(1.2 * dens)
    print(f"rows=2^{log2} dens={dens} key_bits={key_bits} plan={plan}",
          flush=True)

    def limbs_of(ks):
        return _narrow_top([ks[:, W - 1 - w] for w in range(W)], key_bits)

    @jax.jit
    def f_global(ks, cnts):
        s, _ = _compact_sort(limbs_of(ks), [~cnts])
        return s

    @jax.jit
    def f_spec(ks, cnts):
        s, ovf = _compact_sort(limbs_of(ks), [~cnts], plan)
        return s, ovf

    @jax.jit
    def f_cond(ks, cnts):
        # the removed round-3 design: device-side fallback via lax.cond
        # (both branches' outputs held live, padded to a common shape)
        limbs = limbs_of(ks)
        s, ovf = _compact_sort(limbs, [~cnts], plan)

        def cheap():
            pad_n = M - s[0].shape[0]
            return tuple(
                jnp.concatenate(
                    [o, jnp.full(pad_n, np.iinfo(o.dtype.name).max,
                                 dtype=o.dtype)]
                ) for o in s
            )

        def full():
            return tuple(jax.lax.sort(
                list(limbs) + [~cnts], num_keys=W + 1, is_stable=False
            ))

        return jax.lax.cond(ovf, full, cheap)

    t_g = timeit("global compact plan=()", f_global, (keys, lo), reps, M)
    t_s = timeit(f"speculative plan={plan}", f_spec, (keys, lo), reps, M)
    t_c = timeit(f"lax.cond fallback plan={plan}", f_cond, (keys, lo),
                 reps, M)
    print(f"spec vs global: {t_g / t_s:.2f}x | cond overhead vs spec: "
          f"{(t_c - t_s) * 1e3 / (M / 1e6):+.2f} ms/M", flush=True)


if __name__ == "__main__":
    main()
