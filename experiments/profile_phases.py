"""Phase breakdown of the bench steady state on the real chip:
(a) pipeline only, (b) + consolidation sort (no compact), (c) full
(consolidate + compact + shrink). Identifies where the unaccounted
~2.4ms/M of the 9.7ms/M bench profile lives."""

import time

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.native import pack_chunk
    from jellyfish_tpu.ops.count import compact_counted, consolidate_premasked
    import jellyfish_tpu.store as store_mod

    import os
    k = int(os.environ.get("JF_BENCH_K", 21))
    L, n_chunks = 1 << 20, int(os.environ.get("JF_BENCH_CHUNKS", 96))
    chunks_np = B.synth_chunks(n_chunks, L)
    n_mers = B.count_valid_mers(chunks_np, k)
    dev_chunks = []
    for c in chunks_np:
        pw, vb = pack_chunk(c)
        dev_chunks.append(
            (jax.device_put(jnp.asarray(pw)), jax.device_put(jnp.asarray(vb)))
        )

    import functools as ft

    @ft.lru_cache(maxsize=8)
    def checksum_fn(n):
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
            np.asarray(checksum_fn(len(arrays))(*arrays))

    def run(consolidate_fn_override, cadence):
        counter = MerCounter(k, size=1 << 22, canonical=True,
                             rng=np.random.default_rng(42))
        counter.store.consolidate_rows = cadence * (L - k + 1)
        if consolidate_fn_override is not None:
            counter.store._consolidate = consolidate_fn_override(counter.store)

        def one_pass():
            for pw, vb in dev_chunks:
                counter.add_chunk_packed(pw, vb)
            counter.store._consolidate()
            sync_store(counter)

        one_pass()
        counter.reset()
        t0 = time.perf_counter()
        one_pass()
        dt = time.perf_counter() - t0
        return n_mers / dt / 1e6, dt / (n_mers / 1e6) * 1e3

    # (a) pipeline only: consolidation is a no-op (keeps raw runs)
    def no_consol(store):
        def f(compact=None):
            store.raw, store.raw_rows = [], 0  # drop (measure pipeline only)
        return f

    # (b) consolidation keys-only sort, no compact, no shrink
    def consol_only(store):
        import jax as _jax

        @ft.lru_cache(maxsize=8)
        def fn(n_runs):
            @ft.partial(_jax.jit, donate_argnums=tuple(range(n_runs)))
            def f(*keys):
                k2, c2 = consolidate_premasked(
                    jnp.concatenate(keys, axis=0), store.key_bits
                )
                return k2, c2
            return f

        def f(compact=None):
            if not store.raw:
                return
            runs, store.raw, store.raw_rows = store.raw, [], 0
            k2, c2 = fn(len(runs))(*runs)
            store.dedup_levels[0].append((k2, c2, None))
        return f

    for name, override in (
        ("pipeline-only", no_consol),
        ("pipe+consolidate", consol_only),
        ("full", None),
    ):
        rate, per = run(override, cadence=32)
        print(f"{name:18s}: {rate:7.1f}M mers/s  ({per:5.2f} ms/M)",
              flush=True)


if __name__ == "__main__":
    main()
