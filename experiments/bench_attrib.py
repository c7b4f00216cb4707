"""Instrumented bench pass: per-phase wall attribution with forced syncs
at phase boundaries (sum of parts >= un-instrumented total; the parts
locate the time). Phases: pipeline dispatch+sync per batch region,
each grain consolidation (store._consolidate monkey-patched), the tail
drain, shrinks/merges (resolve), final sync."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench as B
from jellyfish_tpu.counter import MerCounter
from jellyfish_tpu.native import pack_chunk

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


@functools.lru_cache(maxsize=64)
def _checksum_fn(n):
    @jax.jit
    def f(*xs):
        acc = jnp.uint32(0)
        for x in xs:
            acc = acc + x.ravel()[0].astype(jnp.uint32)
        return acc
    return f


def sync_store(counter):
    arrays = [x for arrs in counter.store.occupied_levels() for x in arrs]
    if arrays:
        np.asarray(_checksum_fn(len(arrays))(*arrays))


def main():
    k = int(os.environ.get("JF_BENCH_K", 33))
    L = 1 << 20
    n_chunks = int(os.environ.get("JF_BENCH_CHUNKS", 256))
    Bsz = 8
    counter = MerCounter(k, size=1 << 22, canonical=True,
                         rng=np.random.default_rng(42))
    chunks_np = B.synth_chunks(n_chunks, L)
    n_mers = B.count_valid_mers(chunks_np, k)
    dev_chunks = []
    for i in range(0, len(chunks_np), Bsz):
        group = [pack_chunk(c) for c in chunks_np[i:i + Bsz]]
        pw = np.stack([p for p, _ in group])
        vb = np.stack([v for _, v in group])
        dev_chunks.append(
            (jax.device_put(jnp.asarray(pw)), jax.device_put(jnp.asarray(vb)))
        )

    phases = []

    real_consolidate = type(counter.store)._consolidate

    def timed_consolidate(store, compact=None):
        sync_store(counter)
        t0 = time.perf_counter()
        rows = store.raw_rows
        plan_before = store._grain_plan(max(store.raw_rows, 1))
        real_consolidate(store, compact)
        sync_store(counter)
        phases.append((f"consolidate {rows/1e6:6.1f}M rows "
                       f"plan={plan_before} ovf={store.spec_overflows}",
                       time.perf_counter() - t0))

    counter.store._consolidate = functools.partial(
        timed_consolidate, counter.store
    )

    def run_pass(timed):
        t_pipe = 0.0
        for pw, vb in dev_chunks:
            t0 = time.perf_counter()
            counter.add_chunks_packed_batch(pw, vb)
            if timed:
                sync_store(counter)
                t_pipe += time.perf_counter() - t0
        t0 = time.perf_counter()
        counter.store._consolidate(compact=True)
        sync_store(counter)
        t_tail = time.perf_counter() - t0
        if timed:
            phases.append(("pipeline total (synced per batch)", t_pipe))

    run_pass(timed=True)  # compile everything incl. per-batch checksums
    counter.reset()
    counter.store.density_est = None
    phases.clear()
    t0 = time.perf_counter()
    run_pass(timed=True)
    total = time.perf_counter() - t0

    print(f"k={k} mers={n_mers/1e6:.1f}M  instrumented total "
          f"{total:.2f}s = {n_mers/total/1e6:.1f}M mers/s", flush=True)
    for name, dt in phases:
        print(f"  {dt*1e3:8.1f} ms  {dt*1e3/(n_mers/1e6):6.2f} ms/M(all)  "
              f"{name}")


if __name__ == "__main__":
    main()
