"""Recoverable exchange overflow (VERDICT r3 #6): a deliberately skewed
owner map must overflow the compact exchange's per-destination capacity,
and the counter must RECOVER (zeroed step + masked-exchange replay)
with exact counts instead of raising at finalize."""

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna


def test_skewed_owner_map_recovers(rng, monkeypatch):
    import jellyfish_tpu.parallel.sharded as sh

    # route EVERY real key to shard 0: per-dest load becomes ~N instead
    # of N/P, far beyond _exchange_cap
    orig_owner = sh._owner_of_sortkeys

    def skewed(sortkeys, weights, c, n_shards):
        owner = orig_owner(sortkeys, weights, c, n_shards)
        import jax.numpy as jnp
        return jnp.where(owner >= 0, 0, owner)

    monkeypatch.setattr(sh, "_owner_of_sortkeys", skewed)

    counter = sh.ShardedMerCounter(
        k=11, size=1 << 12, mesh=sh.make_mesh(4), canonical=False,
        rng=np.random.default_rng(12),
    )
    counter._overflow_ring_depth = 2  # exercise mid-stream resolution
    seqs = []
    L = 8192  # large enough that _exchange_cap(N, 4) < N (the +2048
    # margin dominates small chunks)
    for step in range(6):
        batch = np.full((4, L), ord("N"), dtype=np.uint8)
        for p in range(4):
            s = random_dna(rng, L - 10)
            seqs.append(s)
            batch[p, : len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)
        counter.add_chunks(batch)
    mers, counts = counter.finalize()
    assert counter.overflow_retries > 0, "skewed map must overflow"
    got = {int(m): int(v) for m, v in zip(mers, counts)}
    assert got == oracle_counts(seqs, 11, False)


def test_unskewed_never_retries(rng):
    import jellyfish_tpu.parallel.sharded as sh

    counter = sh.ShardedMerCounter(
        k=11, size=1 << 12, mesh=sh.make_mesh(4), canonical=False,
        rng=np.random.default_rng(13),
    )
    seqs = []
    batch = np.full((4, 512), ord("N"), dtype=np.uint8)
    for p in range(4):
        s = random_dna(rng, 500)
        seqs.append(s)
        batch[p, : len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)
    counter.add_chunks(batch)
    mers, counts = counter.finalize()
    assert counter.overflow_retries == 0
    got = {int(m): int(v) for m, v in zip(mers, counts)}
    assert got == oracle_counts(seqs, 11, False)
