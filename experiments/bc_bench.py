"""Device bloom-counter insert benchmark (reproduces PERF.md's bc number).

Measures BloomCounter2.insert_counts throughput in device mode (HBM-resident
cells, one jitted program per batch: MXU GF(2) hashes -> masked probe
positions -> sort -> segment-sum -> sorted scatter-add; bloom.py
_bc_insert_dev_fn) against the host numpy fallback on the same data.

Run:  python experiments/bc_bench.py
Env:  JF_BC_LOGM (default 26), JF_BC_BATCH (default 1<<20),
      JF_BC_BATCHES (default 16), JF_BC_K (default 21).

Role in the reference: the `bc` subcommand's bloom_counter2 CAS insert loop
(/root/reference/include/jellyfish/bloom_counter2.hpp:56-107,
 sub_commands/bc_main.cc:67-71).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from jellyfish_tpu.bloom import BloomCounter2, _random_hash_pair

    k = int(os.environ.get("JF_BC_K", 21))
    logm = int(os.environ.get("JF_BC_LOGM", 26))
    batch = int(os.environ.get("JF_BC_BATCH", 1 << 20))
    n_batches = int(os.environ.get("JF_BC_BATCHES", 16))

    rng = np.random.default_rng(7)
    m1, m2 = _random_hash_pair(k, rng)
    W = (2 * k + 31) // 32

    mers = rng.integers(0, 1 << 32, size=(batch, W), dtype=np.uint64).astype(
        np.uint32
    )
    mask_top = (1 << (2 * k - 32 * (W - 1))) - 1
    mers[:, W - 1] &= mask_top
    weights = np.ones(batch, dtype=np.uint32)

    # --- device mode -------------------------------------------------------
    bc = BloomCounter2(1 << logm, 7, k, m1, m2, device=True)
    assert bc._device, "device mode unavailable (no jax?)"
    dev_mers = jax.device_put(mers)
    dev_w = jax.device_put(weights)

    bc.insert_counts(dev_mers, dev_w)  # compile + warm
    # fetch-forced sync (block_until_ready unreliable through the tunnel)
    np.asarray(bc._cells_dev[:1])

    t0 = time.perf_counter()
    for _ in range(n_batches):
        bc.insert_counts(dev_mers, dev_w)
    np.asarray(bc._cells_dev[:1])
    dt = time.perf_counter() - t0
    dev_rate = n_batches * batch / dt
    print(f"device insert: {dev_rate/1e6:.2f}M mers/s "
          f"({n_batches}x{batch} mers, m=2^{logm}, nb=7)")

    # --- host fallback (same data, fewer batches — it is slow) -------------
    bc_h = BloomCounter2(1 << logm, 7, k, m1, m2, device=False)
    n_host = max(1, n_batches // 8)
    t0 = time.perf_counter()
    for _ in range(n_host):
        bc_h.insert_counts(mers, weights)
    dt = time.perf_counter() - t0
    host_rate = n_host * batch / dt
    print(f"host insert:   {host_rate/1e6:.2f}M mers/s ({n_host}x{batch})")
    print(f"speedup: {dev_rate/host_rate:.0f}x")


if __name__ == "__main__":
    main()
