"""Scaling-efficiency benchmark: sharded k-mers/sec over an N-device mesh.

The driver north star's scaling target (BASELINE.json) is >=0.8
k-mers/s/chip efficiency from 1 chip to a multi-chip slice. This is the
end-to-end surface for that measurement: it runs the SAME packed-ingest
counting step as bench.py through ShardedMerCounter (hash-prefix
all-to-all routing + per-shard stores) over meshes of 1..N devices and
reports throughput and efficiency relative to the 1-device rate.

Prints ONE JSON line:
  {"metric": "scaling_efficiency_kmers_per_sec", "value": eff_at_N,
   "unit": "x", "per_device": {"1": rate, ...,}, "devices": N}

On hardware with a single chip (this dev rig) it degenerates to N=1 with
efficiency 1.0 — run it on a multi-chip host for the real number, or with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
for a functional (not performance-meaningful) CPU-mesh validation.

Env knobs: JF_SCALING_DEVICES (mesh sizes, comma list; default
"1,<all>"), JF_BENCH_CHUNK_LEN, JF_SCALING_CHUNKS (per-device chunk
count, default 24), JF_BENCH_K.
"""

import json
import os
import time

import numpy as np

from bench import count_valid_mers, synth_chunks


def measure(mesh_devices, chunks_np, k):
    import jax
    import jax.numpy as jnp

    from jellyfish_tpu.native import pack_chunk
    from jellyfish_tpu.parallel import ShardedMerCounter, make_mesh

    P = len(mesh_devices)
    mesh = make_mesh(P, devices=mesh_devices)
    counter = ShardedMerCounter(
        k, size=1 << 22, mesh=mesh, canonical=True,
        rng=np.random.default_rng(42),
    )

    # stage packed batches: rows 0..P-1 of each dispatch land on shards
    packed = [pack_chunk(c) for c in chunks_np]
    dev_batches = []
    from jax.sharding import NamedSharding, PartitionSpec

    from jellyfish_tpu.parallel.sharded import AXIS

    sharding = NamedSharding(mesh, PartitionSpec(AXIS, None))
    for i in range(0, len(packed) - P + 1, P):
        group = packed[i : i + P]
        pw = np.stack([p for p, _ in group])
        vb = np.stack([v for _, v in group])
        dev_batches.append(
            (
                jax.device_put(jnp.asarray(pw), sharding),
                jax.device_put(jnp.asarray(vb), sharding),
            )
        )

    L = int(chunks_np.shape[1])

    step = counter.packed_step(L)

    def run_pass():
        for pw, vb in dev_batches:
            keys, weights, _overflow = step(pw, vb)
            counter.store.insert_raw(keys, weights, max_weight=L)
        # fetch-forced sync (block_until_ready unreliable via tunnel)
        for run in counter.store.occupied_runs():
            for x in run[:3]:  # keys/lo/hi (run[3] is the dups int)
                if x is not None:
                    np.asarray(jax.device_get(x.addressable_shards[0].data[:1]))

    run_pass()  # compile warmup
    counter.reset()

    t0 = time.perf_counter()
    run_pass()
    elapsed = time.perf_counter() - t0

    n_mers = sum(
        count_valid_mers(chunks_np[i : i + 1], k)
        for i in range(len(dev_batches) * P)
    )
    return n_mers / elapsed


def main():
    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at import; honor an
    # explicit env request (e.g. cpu + 8 virtual devices) via the config
    # API like tests/conftest.py does
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    k = int(os.environ.get("JF_BENCH_K", 21))
    L = int(os.environ.get("JF_BENCH_CHUNK_LEN", 1 << 20))
    per_dev = int(os.environ.get("JF_SCALING_CHUNKS", 24))
    all_devs = jax.devices()
    sizes_env = os.environ.get("JF_SCALING_DEVICES")
    if sizes_env:
        sizes = [int(x) for x in sizes_env.split(",")]
        over = [P for P in sizes if P > len(all_devs)]
        if over:
            raise SystemExit(
                f"JF_SCALING_DEVICES requests {max(over)} devices but only "
                f"{len(all_devs)} are available"
            )
    else:
        sizes = [1, len(all_devs)]
    sizes = sorted({*sizes, 1})  # the 1-device rate anchors efficiency

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    chunks_np = synth_chunks(per_dev * max(sizes), L)
    rates = {}
    for P in sizes:
        rates[str(P)] = round(measure(all_devs[:P], chunks_np[: per_dev * P], k), 1)

    n = str(max(sizes))
    eff = (rates[n] / max(sizes)) / rates["1"] if rates["1"] else 0.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_kmers_per_sec",
                "value": round(eff, 4),
                "unit": "x",
                "per_device": rates,
                "devices": max(sizes),
            }
        )
    )


if __name__ == "__main__":
    main()
