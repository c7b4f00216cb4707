"""Why does the rowsort plan's isolated gain (fused 7.24 vs 10.27 ms/M at
2^27/W=3, fused_plan_probe.py) shrink to ~0.7 ms/M in the sustained bench?

Reproduce the store's EXACT grain input conditions — 32 separate raw runs
produced by the real chunk pipeline (not one pre-materialized array) — and
time the fused consolidate+compact under each factor:

  arms: plan=() donated (production cold grain)
        plan=() non-donated
        plan=(D1,D2) non-donated (production planned grain)
        plan=(D1,D2) donated (hypothetical)

Run: python experiments/grain_context_probe.py  (real chip)
Env: JF_BENCH_K (33), JF_PROBE_BATCHES (16 batches of 8 chunks = 2^27 rows)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench as B
from jellyfish_tpu.counter import MerCounter, _chunk_pipeline_packed_batch
from jellyfish_tpu.native import pack_chunk
from jellyfish_tpu.ops.count import (
    compact_counted, compaction_plan, consolidate_premasked,
)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


@jax.jit
def _checksum(x):
    return x.ravel()[0].astype(jnp.uint32)


def sync(out):
    np.asarray(_checksum(jax.tree.leaves(out)[0]))


def fused_fn(n_runs, key_bits, plan, donate):
    dn = tuple(range(n_runs)) if donate else ()

    @functools.partial(jax.jit, donate_argnums=dn)
    def f(*keys):
        k2, c2, n = consolidate_premasked(
            jnp.concatenate(keys, axis=0), key_bits, return_n=True
        )
        k3, l3, _, ovf = compact_counted(
            k2, c2, None, key_bits, assume_masked=True, plan=plan
        )
        return k3, l3, n | (ovf.astype(jnp.uint32) << jnp.uint32(31))

    return f


def make_runs(counter, dev_chunks):
    """Run the real pipeline over the staged chunks; return the raw runs
    (one [B*Nw, W] array per batch) synced on device."""
    runs = []
    for pw, vb in dev_chunks:
        keys, _ = _chunk_pipeline_packed_batch(
            pw, vb, counter._A, k=counter.k, lsize=counter.lsize,
            canonical=counter.canonical, L=int(pw.shape[1]) * 16,
        )
        runs.append(keys)
    for r in runs:
        sync((r,))
    return runs


def main():
    k = int(os.environ.get("JF_BENCH_K", 33))
    n_batches = int(os.environ.get("JF_PROBE_BATCHES", 16))
    L, Bsz = 1 << 20, 8
    counter = MerCounter(k, size=1 << 22, canonical=True,
                         rng=np.random.default_rng(42))
    key_bits = 2 * k

    chunks_np = B.synth_chunks(n_batches * Bsz, L)
    dev_chunks = []
    for i in range(0, len(chunks_np), Bsz):
        group = [pack_chunk(c) for c in chunks_np[i:i + Bsz]]
        pw = np.stack([p for p, _ in group])
        vb = np.stack([v for _, v in group])
        dev_chunks.append(
            (jax.device_put(jnp.asarray(pw)), jax.device_put(jnp.asarray(vb)))
        )

    M = sum((L - k + 1 + 15) // 16 * 16 * Bsz for _ in range(n_batches))
    plan = compaction_plan(1.3 * 0.242)
    print(f"k={k} rows={M} ({M/2**27:.2f} x 2^27) plan={plan}", flush=True)

    for name, p, donate in (
        ("plan=() donated   (cold grain)", (), True),
        ("plan=() non-donated", (), False),
        (f"plan={plan} non-donated (prod)", plan, False),
        (f"plan={plan} donated", plan, True),
    ):
        times = []
        for rep in range(3):
            runs = make_runs(counter, dev_chunks)
            fn = fused_fn(len(runs), key_bits, p, donate)
            if rep == 0:
                sync(fn(*make_runs(counter, dev_chunks)))  # compile
            t0 = time.perf_counter()
            out = fn(*runs)
            sync(out)
            times.append(time.perf_counter() - t0)
            del out, runs
        best = min(times)
        print(f"{name:36s} {best*1e3/(M/1e6):7.2f} ms/M ({best*1e3:7.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
