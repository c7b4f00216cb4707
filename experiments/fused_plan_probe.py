"""Round-3 probe: does the rowsort plan speed up the PRODUCTION
consolidate+compact sequence (store._consolidate_fn -> _spec_compact_fn)
at the bench's steady-state density? bench showed no end-to-end change;
isolate why.

Run on the real chip: python experiments/fused_plan_probe.py
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
    compact_counted, compaction_plan, consolidate_premasked,
)


@jax.jit
def _checksum(x):
    return x.ravel()[0].astype(jnp.uint32)


def sync(out):
    np.asarray(_checksum(jax.tree.leaves(out)[0]))


def timeit(name, fn, args, reps, M):
    sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best*1e3/(M/1e6):7.2f} ms/M  ({best*1e3:8.1f} ms)",
          flush=True)
    return best


def main():
    log2 = int(os.environ.get("JF_PROBE_LOG2", 27))
    dens = float(os.environ.get("JF_PROBE_DENSITY", 0.25))
    key_bits = int(os.environ.get("JF_PROBE_KEY_BITS", 42))
    reps = int(os.environ.get("JF_PROBE_REPS", 3))
    M = 1 << log2
    W = (key_bits + 31) // 32

    # device-generated raw keys with ~dens distinct fraction: draw keys
    # from a universe of dens*M values so duplicates mimic coverage
    @jax.jit
    def gen(key):
        ks = jax.random.split(key, W)
        uni = max(int(dens * M), 1)
        lo = jax.random.randint(ks[0], (M,), 0, uni, jnp.uint32)
        cols = [lo]
        for w in range(1, W):
            top_bits = min(32, key_bits - 32 * w)
            cols.append(
                jax.random.randint(ks[w], (M,), 0, 2, jnp.uint32)
                * jnp.uint32((1 << (top_bits - 1)) - 1 if top_bits > 1 else 0)
            )
        return jnp.stack(cols, axis=-1)

    raw = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    def fused(plan):
        @jax.jit
        def f(keys):
            k2, c2, n = consolidate_premasked(keys, key_bits, return_n=True)
            k3, l3, _, ovf = compact_counted(
                k2, c2, None, key_bits, assume_masked=True, plan=plan
            )
            return k3, l3, n, ovf

        return f

    plan = compaction_plan(1.2 * dens)
    print(f"rows=2^{log2} dens={dens} key_bits={key_bits} plan={plan}",
          flush=True)
    t_none = timeit("fused consol+compact plan=()", fused(()), (raw,), reps, M)
    t_plan = timeit(f"fused consol+compact plan={plan}", fused(plan),
                    (raw,), reps, M)

    # separate passes to see where the time goes
    @jax.jit
    def consol(keys):
        return consolidate_premasked(keys, key_bits, return_n=True)

    masked = jax.block_until_ready(consol(raw))[:2]

    def comp(plan):
        @jax.jit
        def f(keys, cnts):
            return compact_counted(
                keys, cnts, None, key_bits, assume_masked=True, plan=plan
            )[:2]
        return f

    timeit("consolidate alone", consol, (raw,), reps, M)
    timeit("compact alone plan=()", comp(()), masked, reps, M)
    timeit(f"compact alone plan={plan}", comp(plan), masked, reps, M)
    print(f"speedup fused: {t_none / t_plan:.2f}x", flush=True)


if __name__ == "__main__":
    main()
