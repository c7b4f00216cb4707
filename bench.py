"""Benchmark: k-mers counted/sec/chip (k=21, canonical, FASTQ-stream shape).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "mers/s", "vs_baseline": N}

vs_baseline compares against BASELINE_MERS_PER_SEC, the driver north star's
"32-thread CPU jellyfish" figure (BASELINE.json). The reference repo
publishes no absolute numbers (BASELINE.md) and its CLI is not buildable in
this image (no autotools/yaggo), but its headers-as-library hot path IS:
experiments/ref_cpu_bench.{cc,sh} compiles the reference's own parser ->
mer_iterator -> cooperative hash_counter loop with g++ -O3 and measures it
on this host (k=21 -C FASTQ): 2.4M mers/s/thread, 7.7M at 4 threads (0.79
scaling efficiency; experiments/ref_cpu_bench_results.json). Extrapolated
to 32 server threads that is ~64-80M mers/s, so the 1e8 constant kept here
is GENEROUS to the reference — vs_baseline is a conservative claim.
Override with env JF_BASELINE_MERS_PER_SEC.

The timed section covers the full device pipeline on pre-staged chunks:
encode -> extract -> canonicalize -> GF(2) hash -> sort/segment-reduce ->
LSM merge accumulation. Host FASTA/FASTQ parsing is benchmarked separately
(native parser), mirroring how the reference's own --timing splits
Init/Counting/Writing (count_main.cc:377-382).
"""

import json
import os
import time

import numpy as np

BASELINE_MERS_PER_SEC = float(
    os.environ.get("JF_BASELINE_MERS_PER_SEC", 1.0e8)
)


def synth_chunks(n_chunks: int, L: int, read_len: int = 150, seed: int = 1234):
    """FASTQ-like chunk bytes: `read_len`-base reads sampled from a fixed
    synthetic genome (sequencing-coverage workload, the north-star config),
    joined by one separator byte per read like SequenceChunker emits.

    Genome size defaults to (total bases) / 8 — i.e. ~8x coverage — and is
    overridable with JF_BENCH_GENOME."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    total = n_chunks * L
    G = int(os.environ.get("JF_BENCH_GENOME", max(total // 8, 1 << 20)))
    genome = bases[rng.integers(0, 4, size=G)]
    out = np.empty((n_chunks, L), dtype=np.uint8)
    stride = read_len + 1
    n_reads = (L + stride - 1) // stride
    for i in range(n_chunks):
        starts = rng.integers(0, G - read_len, size=n_reads)
        idx = starts[:, None] + np.arange(read_len)[None, :]
        reads = np.concatenate(
            [genome[idx], np.full((n_reads, 1), ord("N"), dtype=np.uint8)],
            axis=1,
        ).reshape(-1)
        out[i] = reads[:L]
    return out


def count_valid_mers(chunks: np.ndarray, k: int) -> int:
    """Exact number of valid k-mer windows in the staged chunks (host)."""
    total = 0
    table = np.zeros(256, dtype=bool)
    table[np.frombuffer(b"ACGTacgt", dtype=np.uint8)] = True
    for row in chunks:
        ok = table[row]
        run = 0
        # vectorized run-length: windows fully inside an ACGT run
        edges = np.flatnonzero(np.diff(np.concatenate(([0], ok.view(np.int8), [0]))))
        starts, ends = edges[::2], edges[1::2]
        lens = ends - starts
        total += int(np.maximum(lens - (k - 1), 0).sum())
    return total


def probe_device(timeout_s: float) -> None:
    """Fail fast when the device is unreachable (the axon tunnel has
    gone down for hours at a time; a hung tiny-op would otherwise eat
    the driver's whole bench budget). Runs a 1 KB jit op on a watchdog:
    on timeout, reports to stderr and exits 3 without a JSON line."""
    import sys
    import threading

    done = threading.Event()

    def _probe():
        import jax
        import jax.numpy as jnp

        x = jax.jit(lambda a: (a * 2 + 1).sum())(jnp.arange(256))
        np.asarray(x)  # fetch-forced sync (block_until_ready unreliable)
        done.set()

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(
            f"bench: device unreachable (tiny-op probe exceeded "
            f"{timeout_s:.0f}s; tunnel down?) — no measurement taken",
            file=sys.stderr,
        )
        os._exit(3)


def main():
    probe_device(float(os.environ.get("JF_BENCH_PROBE_TIMEOUT", 120)))

    import jax
    import jax.numpy as jnp

    from jellyfish_tpu.counter import MerCounter

    k = int(os.environ.get("JF_BENCH_K", 21))
    L = int(os.environ.get("JF_BENCH_CHUNK_LEN", 1 << 20))
    # 256 chunks (~268M mers) cross the store's 2^27-row grain twice, so
    # the timed window pays every steady-state cost (consolidation AND
    # compaction) — the SUSTAINED rate is the headline (round-3 verdict:
    # the deferred-compaction 96-chunk window flattered the number; use
    # JF_BENCH_CHUNKS=96 to reproduce the burst figure)
    n_chunks = int(os.environ.get("JF_BENCH_CHUNKS", 256))
    counter = MerCounter(
        k, size=1 << 22, canonical=True, rng=np.random.default_rng(42),
        pack_resting=bool(os.environ.get("JF_BENCH_PACKED")),
    )
    if os.environ.get("JF_BENCH_PACK_LEVEL"):
        counter.store._pack_level = int(os.environ["JF_BENCH_PACK_LEVEL"])

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    # the timed region is the "Counting" phase in the reference's --timing
    # split (count_main.cc:377-382) — ingest + every combine the store's
    # policy triggers at this volume; the once-per-job output formatting
    # (finalize compaction + file write) is Writing. The store's default
    # grain (2^27 rows) is used unless JF_BENCH_CADENCE (in chunks)
    # overrides it; at the default 96-chunk volume the backlog drains with
    # one keys-only consolidation, while >=128-chunk runs also pay the
    # fused compacting sort in the window (steady state; see PERF.md).
    if "JF_BENCH_CADENCE" in os.environ:
        counter.store.consolidate_rows = int(
            os.environ["JF_BENCH_CADENCE"]
        ) * (L - k + 1)

    import functools as _ft

    @_ft.lru_cache(maxsize=8)
    def _checksum_fn(n_arrays):
        @jax.jit
        def f(*xs):
            acc = jnp.uint32(0)
            for x in xs:
                acc = acc + x.ravel()[0].astype(jnp.uint32)
            return acc
        return f

    def sync(counter):
        # one dispatch + one scalar fetch touching every live run
        # (block_until_ready is unreliable through the axon tunnel)
        arrays = [x for arrs in counter.store.occupied_levels() for x in arrs]
        if arrays:
            np.asarray(_checksum_fn(len(arrays))(*arrays))

    def run_pass():
        for pw, vb in dev_chunks:
            counter.add_chunks_packed_batch(pw, vb)
        # drain the tail backlog with FORCED compaction: every ingested
        # row pays the full steady-state cost (consolidate AND compact)
        # inside the timed window, whatever the chunk count — nothing
        # defers into the Writing phase
        counter.store._consolidate(compact=True)
        sync(counter)

    chunks_np = synth_chunks(n_chunks, L)
    n_mers = count_valid_mers(chunks_np, k)
    from jellyfish_tpu.native import pack_chunk

    # stage stacked batches of B chunks: one ingest dispatch per batch
    B = int(os.environ.get("JF_BENCH_BATCH", 8))
    packed = [pack_chunk(c) for c in chunks_np]
    dev_chunks = []
    for i in range(0, len(packed), B):
        group = packed[i : i + B]
        pw = np.stack([p for p, _ in group])
        vb = np.stack([v for _, v in group])
        dev_chunks.append(
            (jax.device_put(jnp.asarray(pw)), jax.device_put(jnp.asarray(vb)))
        )

    # warmup: one full pass so every program shape is compiled
    run_pass()
    counter.reset()

    t0 = time.perf_counter()
    run_pass()
    elapsed = time.perf_counter() - t0

    value = n_mers / elapsed
    print(
        json.dumps(
            {
                "metric": f"kmers_sustained_per_sec_per_chip_k{k}",
                "value": round(value, 1),
                "unit": "mers/s",
                "vs_baseline": round(value / BASELINE_MERS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
