"""Multi-chip k-mer counting: hash-prefix sharded table over a device mesh.

The reference's only parallelism is N pthreads CAS-ing into one shared table
(count_main.cc:152-184, large_hash_array.hpp:716-752). The TPU-native design
shards the *table* across chips by hash prefix and the *input* across chips
by chunk (data parallel ingest):

    owner(sortkey) = floor(top-16-bits(sortkey) * P / 2^16)

Each device ingests its own chunk, extracts/hashes locally, then an
all-to-all over the `shards` mesh axis routes every (sortkey, weight) pair
to its owner shard — the collective rides ICI. The owner map is monotone
in the sortkey (works for ANY shard count, not just powers of two), so
shard p owns one contiguous range of the global hash order: the final
dump is just the
shard-order concatenation of per-shard sorted runs (no merge machinery;
compare the reference's mer_heap + token_ring recovery,
sorted_dumper.hpp:57-101).

Per-shard accumulation reuses the forest-store kernels (ops/count.merge_raw
/ merge_many) vmapped over a leading [P] shard axis that stays sharded on
the mesh, so every merge is chip-local (no collectives).

Exchange: each device locally consolidates its chunk (keys-only sort +
segment counts + compaction — the ops/count.py kernels on chunk scale)
and ships one contiguous ~(N/P + 25%) segment of DEDUPLICATED
(key, count) pairs per destination through a regular tiled all-to-all —
exchange volume <= ~1.3x the distinct-key volume and per-step ingest is
[P, ~1.3N] rather than the masked fallback's [P, P*N]. Because duplicates
collapse before routing, pathological repeat content (homopolymers,
satellite DNA) cannot skew a destination: per-destination load is the
DISTINCT-key count, which is binomial under the random invertible matrix.
Capacity overflow (a >25% deviation of that binomial) is RECOVERED,
never silently truncated: the overflowed step's contribution is zeroed
on device and the step replays through the capacity-free masked
exchange (see ShardedMerCounter._note_step). The masked exchange also
remains selectable as compact_exchange=False.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from jellyfish_tpu.gf2 import GF2Matrix
from jellyfish_tpu.counter import ceil_log2
from jellyfish_tpu.ops import multiword as mw
from jellyfish_tpu.ops.count import (
    compact_counted,
    compaction_plan,
    merge_many,
    merge_raw,
)
from jellyfish_tpu.ops.packed_run import (
    PackedRunBatch,
    pack_run_batched,
    unpack_run_batched,
)
from jellyfish_tpu.ops.hashing import (
    gf2_times,
    inverse_masks_of_matrix,
    masks_of_matrix,
    mers_of_sortkeys,
    sortkey_of_mers,
)
from jellyfish_tpu.ops.mers import (
    encode_codes,
    extract_mers_packed,
    extract_mers_phased,
)

__all__ = ["ShardedMerCounter", "make_mesh"]

AXIS = "shards"


def make_mesh(n_shards: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the `shards` axis."""
    if devices is None:
        devices = jax.devices()
        if n_shards is not None:
            devices = devices[:n_shards]
    return Mesh(np.array(devices), (AXIS,))


def _owner_of_sortkeys(sortkeys, weights, c: int, n_shards: int):
    """Owner shard of each entry: the top bits of the 2k-bit sortkey
    range-mapped onto [0, n_shards) with a monotone multiply-shift
    (owner = floor(topB * P / 2^B)). Monotone in the sortkey, so shard p
    still owns one contiguous slice of the global hash order for ANY P —
    including non-power-of-two meshes (a plain log2-prefix owner would
    route to 2^ceil_log2(P) > P destinations and silently drop rows).
    PAD entries (weight == 0) get owner -1 (sent nowhere)."""
    if n_shards <= 1:
        return jnp.where(weights == 0, -1, 0).astype(jnp.int32)
    B = min(16, c)
    top = mw.mw_shift_right(sortkeys, c - B)[..., 0]
    # PAD rows are all-ones in every 32-bit limb, which exceeds 2^B - 1
    # when c is not a limb multiple: clamp before the multiply (real keys
    # are < 2^B by construction, all-ones maps to owner P - 1)
    top = jnp.minimum(top, jnp.uint32((1 << B) - 1))
    owner = ((top * jnp.uint32(n_shards)) >> B).astype(jnp.int32)
    return jnp.where(weights == 0, -1, owner)


def _exchange_cap(N: int, n_shards: int) -> int:
    """Static per-destination segment capacity for the compact exchange.
    The hash matrix is random and invertible, so per-(sender, dest) loads
    are binomial around N/P with sd ~ sqrt(N/P): a 25% + 2048 margin is
    dozens of sigmas; an overflow is still detected on device and the
    step REPLAYED through the capacity-free masked exchange (never
    silently truncated)."""
    if n_shards <= 1:
        return N
    return N // n_shards + N // (4 * n_shards) + 2048


def _build_step(mesh, k: int, lsize: int, canonical: bool, has_matrix: bool,
                packed_L: int | None = None, compact: bool = True,
                stage: str = "full", cap_mult: int = 1):
    """Jitted per-step program: [P, L] chunks -> per-shard routed runs.

    compact=True (default): each device consolidates its chunk locally
    (keys-only sort + segment counts + one compacting sort; the owner map
    is monotone in the sortkey, so key order IS owner order), slices one
    contiguous ~(N/P + 25%) segment of deduplicated (key, count) pairs
    per destination and a regular tiled all-to-all ships keys + counts —
    per-step store ingest is [P, ~1.3N] instead of [P, P*N] (the masked
    scheme's P x blowup in both bandwidth and downstream sort volume),
    and duplicate-key skew (homopolymers) cannot overflow a segment.
    Static shapes on every backend (jax.lax.ragged_all_to_all exists but
    is unimplemented on XLA:CPU, so it would be untestable here).
    Returns (keys [P, P*capp, W], counts [P, P*capp] u32, overflow [P]
    i32) — the receive is P concatenated deduplicated sender segments.

    compact=False: the capacity-free masked all-to-all (full-length
    masked copy per destination, weights in {0,1}) kept as a fallback.

    stage="local": stop after the per-shard consolidate+compact and
    return (keys [P, N, W], counts [P, N]) UNROUTED — the ingest-time
    bloom filtering hook (the host filters the per-shard deduplicated
    run, then routes it with _build_route_step)."""
    n_shards = mesh.devices.size
    c = 2 * k

    def _local_masked(sk, w, N, W):
        owner = _owner_of_sortkeys(sk, w, c, n_shards)
        dst = jnp.arange(n_shards, dtype=jnp.int32)
        send_mask = owner[None, :] == dst[:, None]  # [P, N]
        sent_w = jnp.where(send_mask, w[None, :], 0)
        sent_keys = jnp.where(
            send_mask[..., None], sk[None, :, :], jnp.uint32(0xFFFFFFFF)
        )
        if n_shards > 1:
            recv_keys = jax.lax.all_to_all(
                sent_keys, AXIS, split_axis=0, concat_axis=0, tiled=True
            )
            recv_w = jax.lax.all_to_all(
                sent_w, AXIS, split_axis=0, concat_axis=0, tiled=True
            )
        else:
            recv_keys, recv_w = sent_keys, sent_w
        zero = jnp.zeros((1,), dtype=jnp.int32)
        return (
            recv_keys.reshape(1, n_shards * N, W),
            recv_w.reshape(1, n_shards * N),
            zero,
        )

    def _consolidate_chunk(sk, w, N, W):
        # fused local consolidate + compact (ops/count.py kernels inlined
        # on the chunk): sort keys, count duplicate segments, compact the
        # (key, count) pairs to the ascending prefix. The exchange then
        # ships DEDUPLICATED pairs: a pathological chunk (homopolymer /
        # satellite repeats) collapses to one row per distinct key, so
        # per-destination capacity only has to cover DISTINCT keys — and
        # distinct-key loads are binomial under the random invertible
        # matrix (a hot key can never overflow a segment).
        limbs = [sk[:, W - 1 - i] for i in range(W)]
        s = jax.lax.sort(limbs, num_keys=W, is_stable=False)
        n_valid = jnp.sum(w, dtype=jnp.uint32).astype(jnp.int32)
        idx = jnp.arange(N, dtype=jnp.int32)
        neq = s[0] != jnp.roll(s[0], 1)
        for l in s[1:]:
            neq = neq | (l != jnp.roll(l, 1))
        is_new = neq.at[0].set(True)
        start = jax.lax.cummax(jnp.where(is_new, idx, 0))
        is_last = jnp.roll(is_new, -1).at[N - 1].set(True)
        # segment count restricted to valid rows: PADs are all-ones and
        # sort last, so the all-ones segment's valid occurrences are the
        # rows below n_valid (genuine all-ones mers are bit-identical to
        # PADs; exactly (#all-ones-rows - #pads) sit below n_valid)
        cnt = jnp.maximum(jnp.minimum(idx + 1, n_valid) - start, 0)
        cnt = jnp.where(is_last, cnt, 0).astype(jnp.uint32)
        keep = cnt != 0
        m_limbs = [jnp.where(keep, l, jnp.uint32(0xFFFFFFFF)) for l in s]
        # compact with ~count as the least-significant sort key: real
        # entries (including a genuine all-ones key with count > 0) order
        # before pure-PAD rows within the all-ones block
        s2 = jax.lax.sort(m_limbs + [~cnt], num_keys=W + 1, is_stable=False)
        ck = jnp.stack([s2[W - 1 - i] for i in range(W)], axis=-1)
        ccnt = ~s2[W]
        return ck, ccnt

    def _local_compact(sk, w, N, W):
        ck, ccnt = _consolidate_chunk(sk, w, N, W)
        return _route_compact(ck, ccnt, N, W, cap_mult)

    def _route_compact(ck, ccnt, N, W, cap_mult):
        own = _owner_of_sortkeys(ck, ccnt, c, n_shards)
        dst = jnp.arange(n_shards, dtype=jnp.int32)
        send_sizes = jnp.sum(
            own[None, :] == dst[:, None], axis=1, dtype=jnp.int32
        )
        input_offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(send_sizes)[:-1]]
        )
        capp = min(cap_mult * _exchange_cap(N, n_shards), N)
        # one contiguous segment per destination, cut with dynamic slices
        # from the compacted run (PAD-padded so slices never clamp)
        padded = jnp.concatenate(
            [ck, jnp.full((capp, W), 0xFFFFFFFF, dtype=jnp.uint32)],
            axis=0,
        )
        padded_w = jnp.concatenate(
            [ccnt, jnp.zeros(capp, dtype=jnp.uint32)]
        )
        segs = [
            jax.lax.dynamic_slice(padded, (input_offsets[d], 0), (capp, W))
            for d in range(n_shards)
        ]
        wsegs = [
            jax.lax.dynamic_slice(padded_w, (input_offsets[d],), (capp,))
            for d in range(n_shards)
        ]
        send = jnp.stack(segs)      # [P, capp, W]
        send_w = jnp.stack(wsegs)   # [P, capp]
        iot = jnp.arange(capp, dtype=jnp.int32)
        seg_mask = iot[None, :] < send_sizes[:, None]
        send = jnp.where(seg_mask[..., None], send, jnp.uint32(0xFFFFFFFF))
        send_w = jnp.where(seg_mask, send_w, 0)
        recv = jax.lax.all_to_all(
            send, AXIS, split_axis=0, concat_axis=0, tiled=True
        )  # [P, capp, W]: segment from each sender
        recv_w = jax.lax.all_to_all(
            send_w, AXIS, split_axis=0, concat_axis=0, tiled=True
        )
        overflow = jnp.any(send_sizes > capp).astype(jnp.int32).reshape(1)
        # RECOVERABLE overflow: when ANY sender overflowed (global psum),
        # the whole step's contribution is zeroed on device — truncated
        # segments never reach the store — and the host re-runs the
        # retained step through the capacity-free masked exchange
        # (ShardedMerCounter._resolve_overflow_ring). The flag returned
        # to the host is the GLOBAL count, identical on every shard.
        ov_global = jax.lax.psum(overflow, AXIS)
        bad = ov_global[0] > 0
        rk = jnp.where(bad, jnp.uint32(0xFFFFFFFF),
                       recv.reshape(1, n_shards * capp, W))
        rw = jnp.where(bad, jnp.uint32(0),
                       recv_w.reshape(1, n_shards * capp))
        return (rk, rw, ov_global)

    def _local_core(mers, valid, masks):
        sk = sortkey_of_mers(mers, masks, k, lsize)
        w = valid.astype(jnp.uint32)
        N, W = sk.shape
        sk = jnp.where(valid[:, None], sk, jnp.uint32(0xFFFFFFFF))
        if stage == "local":
            ck, ccnt = _consolidate_chunk(sk, w, N, W)
            return ck[None], ccnt[None]
        if compact and n_shards > 1:
            return _local_compact(sk, w, N, W)
        return _local_masked(sk, w, N, W)

    if stage == "route":
        # route an (already filtered) per-shard compacted run: the
        # ingest-time bloom hook's second half, and the 2x-capacity
        # overflow replay path for filtered steps
        def route_local(ck, ccnt):
            N, W = ck.shape[1], ck.shape[2]
            ck2 = ck.reshape(ck.shape[1:])
            cc2 = ccnt.reshape(-1)
            # the host-side filter zeroes DROPPED entries in place,
            # leaving holes in the compacted prefix — but the segment
            # slicing below cuts CONTIGUOUS per-owner ranges, so the run
            # must be re-compacted first (zero-count rows to PAD, reals
            # back to the dense ascending prefix)
            ck2, cc2, _, _ = compact_counted(
                ck2, cc2, None, c, assume_masked=False
            )
            return _route_compact(ck2, cc2, N, W, cap_mult)

        shard_fn = jax.shard_map(
            route_local,
            mesh=mesh,
            in_specs=(
                PartitionSpec(AXIS, None, None),
                PartitionSpec(AXIS, None),
            ),
            out_specs=(
                PartitionSpec(AXIS, None, None),
                PartitionSpec(AXIS, None),
                PartitionSpec(AXIS),
            ),
        )
        return jax.jit(shard_fn)

    a_spec = PartitionSpec() if has_matrix else None
    if packed_L is None:
        def local(chunk, masks):
            chunk = chunk.reshape(-1)  # [1, L] block -> [L]
            codes = encode_codes(chunk)
            mers, valid = extract_mers_phased(codes, k, canonical)
            return _local_core(mers, valid, masks)

        in_specs = (PartitionSpec(AXIS, None), a_spec)
    else:
        def local(pwords, validbits, masks):
            mers, valid = extract_mers_packed(
                pwords.reshape(-1), validbits.reshape(-1), k, packed_L,
                canonical,
            )
            return _local_core(mers, valid, masks)

        in_specs = (
            PartitionSpec(AXIS, None), PartitionSpec(AXIS, None), a_spec
        )
    if stage == "local":
        out_specs = (
            PartitionSpec(AXIS, None, None),
            PartitionSpec(AXIS, None),
        )
    else:
        out_specs = (
            PartitionSpec(AXIS, None, None),
            PartitionSpec(AXIS, None),
            PartitionSpec(AXIS),
        )
    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return jax.jit(shard_fn)


def _addressable_rows(arr) -> dict:
    """{global row index: numpy row} over the addressable shards of a
    [P, ...] array sharded along axis 0 (works in single- and
    multi-process meshes)."""
    out = {}
    for sh in arr.addressable_shards:
        start = sh.index[0].start or 0
        data = np.asarray(sh.data)
        for i in range(data.shape[0]):
            out[start + i] = data[i]
    return out


@functools.partial(jax.jit, static_argnames=("k", "lsize"))
def _recover_mers_batched(keys, inv_masks, k, lsize):
    P, M, W = keys.shape
    flat = mers_of_sortkeys(keys.reshape(P * M, W), inv_masks, k, lsize)
    return flat.reshape(P, M, W)


@functools.lru_cache(maxsize=64)
def _merge_raw_batched_fn(n_runs: int, use_vword: bool):
    @functools.partial(jax.jit, donate_argnums=tuple(range(2 * n_runs)))
    def f(*args):
        keys = jnp.concatenate(args[0::2], axis=1)
        w = jnp.concatenate(args[1::2], axis=1)
        return jax.vmap(lambda kk, ww: merge_raw(kk, ww, use_vword))(keys, w)

    return f


@functools.lru_cache(maxsize=64)
def _merge_general_batched_fn(arity: tuple, use_vword: bool, compact: bool,
                              max_dups: int | None = None,
                              key_bits=None, with_hi: bool = True):
    """max_dups: bound on occurrences of one key in the concatenation
    (defaults to len(arity) — every run deduplicated). Compact-exchange
    level-1 runs are P concatenated sender segments, so they contribute P
    potential duplicates each. with_hi=False (compact=False only) drops
    the masked hi limb from the output — callers may do so ONLY when
    total weight provably fits u32 (the single-chip store's hi-drop
    rule, see SortedCountStore._maybe_merge_dedup)."""
    n_args = sum(arity)
    any_hi = any(a == 3 for a in arity)
    nd = len(arity) if max_dups is None else int(max_dups)

    @functools.partial(jax.jit, donate_argnums=tuple(range(n_args)))
    def f(*args):
        keys, lo, hi = [], [], []
        off = 0
        for a in arity:
            keys.append(args[off])
            lo.append(args[off + 1])
            if any_hi:
                hi.append(
                    args[off + 2] if a == 3
                    else jnp.zeros_like(args[off + 1])
                )
            off += a
        kk = jnp.concatenate(keys, axis=1)
        ll = jnp.concatenate(lo, axis=1)
        # per-shard REAL input rows (count != 0): receives are mostly
        # segment-capacity PAD, so the store's density estimator must be
        # fitted against real rows, not total rows (reals concentrate in
        # the real-keyed region of the sorted merge output — a
        # total-rows ratio would under-plan it by the pad factor)
        nz = ll != 0
        if any_hi:
            hh = jnp.concatenate(hi, axis=1)
            nz = nz | (hh != 0)
        real_in = jnp.sum(nz.astype(jnp.uint32), axis=1)
        if any_hi:
            out = jax.vmap(
                lambda a_, b_, c_: merge_many(
                    a_, b_, c_, max_dups=nd, compact=compact,
                    key_bits=key_bits,
                )
            )(kk, ll, hh)
        else:
            out = jax.vmap(
                lambda a_, b_: merge_many(
                    a_, b_, None, max_dups=nd, compact=compact,
                    key_bits=key_bits,
                )
            )(kk, ll)
        if not with_hi and not compact:
            return out[0], out[1], None, None, real_in
        return out[0], out[1], out[2], out[3], real_in

    return f


@functools.lru_cache(maxsize=64)
def _compact_batched_fn(key_bits, plan: tuple, has_hi: bool, donate: bool):
    """Vmapped (planned) compaction of a sharded MASKED counted run.

    The multi-chip carrier of the single-chip _final_compact_fn: per
    shard, count the real rows from the pre-compact masked counts, then
    compact_counted with the shared rowsort plan. Returns (keys, lo,
    hi|None, ns_packed [P] u32) with per-shard n | (ovf << 31) — the
    caller any-reduces the ovf bits (one tiny jitted reduce, identical
    on every process of a multi-host mesh) and recomputes plan-free from
    the retained masked arrays when any shard's rowsort overflowed."""
    dn = ((0, 1, 2) if has_hi else (0, 1)) if donate else ()

    if has_hi:
        @functools.partial(jax.jit, donate_argnums=dn)
        def f(keys, lo, hi):
            def per(k_, l_, h_):
                n = jnp.sum(((l_ | h_) != 0).astype(jnp.uint32))
                k2, l2, h2, ovf = compact_counted(
                    k_, l_, h_, key_bits, assume_masked=True, plan=plan
                )
                return k2, l2, h2, (
                    n | (ovf.astype(jnp.uint32) << jnp.uint32(31))
                )
            return jax.vmap(per)(keys, lo, hi)
    else:
        @functools.partial(jax.jit, donate_argnums=dn)
        def f(keys, lo):
            def per(k_, l_):
                n = jnp.sum((l_ != 0).astype(jnp.uint32))
                k2, l2, _, ovf = compact_counted(
                    k_, l_, None, key_bits, assume_masked=True, plan=plan
                )
                return k2, l2, (
                    n | (ovf.astype(jnp.uint32) << jnp.uint32(31))
                )
            k2, l2, nn = jax.vmap(per)(keys, lo)
            return k2, l2, None, nn

    return f


@jax.jit
def _stats_reduce(ns):
    """[max real n over shards, any ovf bit] as one replicated [2] u32
    vector — a single fetch that is identical on every process (the
    reduces are global collectives under pjit), so shrink caps and
    recompute decisions stay consistent on multi-host meshes."""
    ns = ns.astype(jnp.uint32)
    return jnp.stack([
        jnp.max(ns & jnp.uint32(0x7FFFFFFF)),
        jnp.any((ns >> jnp.uint32(31)) != 0).astype(jnp.uint32),
    ])


@jax.jit
def _stats_ratio_reduce(ns, real_in):
    """[max n, any ovf, max per-shard n/real_in as 2^20 fixed-point] —
    the density ratio is reduced PER SHARD on device (max of quotients,
    not quotient of maxes) so it upper-bounds every shard's real-region
    density; replicated like _stats_reduce."""
    ns = ns.astype(jnp.uint32)
    n = ns & jnp.uint32(0x7FFFFFFF)
    r = jnp.maximum(real_in.astype(jnp.float32), 1.0)
    ratio = jnp.max(n.astype(jnp.float32) / r)
    fxp = jnp.minimum(ratio * jnp.float32(1 << 20),
                      jnp.float32(1 << 21)).astype(jnp.uint32)
    return jnp.stack([
        jnp.max(n),
        jnp.any((ns >> jnp.uint32(31)) != 0).astype(jnp.uint32),
        fxp,
    ])


@functools.lru_cache(maxsize=16)
def _bc_check_batched_fn(nb: int, logm: int, k: int, lsize: int):
    """Vmapped device --bc filter on a per-shard consolidated run:
    recover mers from the sortkeys, double-hash (two MXU bit-matmuls,
    bloom_common.hpp:60-79), probe the replicated cells and zero counts
    whose min probed cell is < 2 (bloom_counter2.hpp:109-142). Exact vs
    the host path: m = 2^logm <= 2^32 makes (h + i*h') mod m a pure u32
    mask, and the check is stateless — -d --bc output stays
    byte-identical to single-chip."""

    @jax.jit
    def f(keys, counts, cells, Ainv, A1, A2):
        def per(k_, c_):
            m_ = mers_of_sortkeys(k_, Ainv, k, lsize)
            h0 = gf2_times(m_, A1, 2)[:, 0]
            h1 = gf2_times(m_, A2, 2)[:, 0]
            mask = (jnp.uint32((1 << logm) - 1) if logm < 32
                    else ~jnp.uint32(0))
            i = jnp.arange(nb, dtype=jnp.uint32)[:, None]
            pos = (h0[None, :] + i * h1[None, :]) & mask
            keep = jnp.min(cells[pos], axis=0) >= jnp.uint8(2)
            return jnp.where((c_ != 0) & keep, c_, jnp.uint32(0))

        return jax.vmap(per)(keys, counts)

    return f


@functools.lru_cache(maxsize=16)
def _bf_filter_batched_fn(nb: int, logm: int, k: int, lsize: int):
    """Vmapped device --bf filter applied at the OWNER shard to the
    deduplicated per-step receive: per-shard persistent bit state (each
    mer always routes to the same owner, so per-owner states partition
    the key space and every mer is filtered against exactly one state —
    the single-chip "first occurrence consumed" semantics at step
    granularity, bloom_filter.hpp:42-75 / count_main.cc:122-130)."""

    @jax.jit
    def f(keys, counts, bits, Ainv, A1, A2):
        def per(k_, c_, b_):
            m_ = mers_of_sortkeys(k_, Ainv, k, lsize)
            h0 = gf2_times(m_, A1, 2)[:, 0]
            h1 = gf2_times(m_, A2, 2)[:, 0]
            mask = (jnp.uint32((1 << logm) - 1) if logm < 32
                    else ~jnp.uint32(0))
            i = jnp.arange(nb, dtype=jnp.uint32)[:, None]
            pos = (h0[None, :] + i * h1[None, :]) & mask
            valid = c_ != 0
            present = jnp.all(b_[pos] | ~valid[None, :], axis=0) & valid
            newc = jnp.where(valid,
                             jnp.where(present, c_, c_ - 1),
                             jnp.uint32(0))
            # only VALID mers' probes enter the state (PAD rows recover
            # to garbage mers; drop them past the bitmap). Sentinel =
            # the bitmap size itself (caller gates logm <= 30 so it
            # stays inside int32)
            ins = jnp.where(valid[None, :], pos.astype(jnp.int32),
                            jnp.int32(1 << logm))
            b2 = b_.at[ins.reshape(-1)].set(True, mode="drop")
            return newc, b2

        return jax.vmap(per)(keys, counts, bits)

    return f


@jax.jit
def _strip_ovf_bits(ns):
    """Clear the packed ovf flag from a [P] occupancy vector."""
    return (
        ns.astype(jnp.uint32) & jnp.uint32(0x7FFFFFFF)
    ).astype(jnp.int32)


@functools.lru_cache(maxsize=64)
def _shrink_batched_fn(cap: int, has_hi: bool):
    n_args = 3 if has_hi else 2

    @functools.partial(jax.jit, donate_argnums=tuple(range(n_args)))
    def f(*args):
        return tuple(x[:, :cap] for x in args)

    return f


class _ShardedStore:
    """Forest store with a leading [P] shard axis kept sharded on the mesh
    so every merge stays chip-local (no collectives). Runs are tuples
    (keys [P, M, W], lo [P, M], hi [P, M] | None, dups) where `dups`
    bounds how many rows one key may occupy in the run (1 for merged
    output; n_senders for a compact-exchange receive; None for raw {0,1}
    runs, whose duplicates are unbounded) — or a PackedRunBatch (always
    deduplicated, dups=1).

    Round-4 single-chip machinery carried to the mesh (VERDICT r4 task
    1): every merge level >= 1 COMPACTS (with a rowsort plan when a
    density estimate exists — ovf any-reduced across shards, plan-free
    recompute from retained masked arrays on any trip), shrinks to an
    eighth-pow2 common capacity, drops the hi limb while total weight
    provably fits u32, stages over-budget merges in budget-sized groups
    (the single-chip _merge_rows_budget semantics, per-device rows along
    axis 1), and optionally bit-packs resting runs (pack_resting) so
    --packed-store composes with -d. Shrinks/ovf checks are DEFERRED via
    a pending list and resolved from one replicated [2] u32 reduce
    (_stats_reduce), keeping host syncs off the dispatch path and every
    decision identical across processes of a multi-host mesh."""

    def __init__(self, W: int, key_bits: int, branch: int = 8,
                 max_levels: int = 16, pack_resting: bool = False,
                 multiprocess: bool = False):
        self.W = W
        self.key_bits = int(key_bits)
        self.branch = int(branch)
        self.use_vword = key_bits % 32 == 0
        self.levels: list[list] = [[] for _ in range(max_levels)]
        self.total_weight = 0
        self.pack_resting = bool(pack_resting)
        self._pack_level = 2
        self.multiprocess = bool(multiprocess)
        # per-DEVICE cap on one merge's input bytes (rows along axis 1;
        # same budget/semantics as SortedCountStore._merge_bytes_budget)
        self._merge_bytes_budget = 2_400_000_000
        # deferred resolution: (lvl, run, ns_dev, src_rows, retained,
        # real_in_dev) — retained = ("merge", has_hi, margs) for planned
        # merges, real_in_dev the per-shard real-input-row vector the
        # density ratio is fitted from
        self._pending: list = []
        # density estimators (see _plan_for): per-level observed
        # max-shard density of the most recent resolved compacting merge
        self._ratios: dict[int, float] = {}
        self._max_n = 0   # largest per-shard occupancy ever resolved
        self.density_est: float | None = None
        self.spec_overflows = 0
        self._plan_margin = 1.2
        self.plans_engaged = 0

    # -- ingestion ----------------------------------------------------------

    def insert_raw(self, keys, weights, max_weight: int) -> None:
        """Raw run (weights in {0,1}, unbounded duplicates — the masked
        exchange's output). Lives at level 0 and combines via the
        segment-length kernel."""
        self._opportunistic_resolve()
        self.levels[0].append((keys, weights, None, None))
        self.total_weight += int(max_weight)
        self._cascade(0)

    def insert_dedup(self, keys, lo, max_weight: int, dups: int) -> None:
        """Counted run with at most `dups` rows per key (a compact-
        exchange receive: `dups` concatenated deduplicated sender
        segments). Enters above the raw level so it only ever meets
        merge_many's bounded log-scan."""
        self._opportunistic_resolve()
        self.levels[1].append((keys, lo, None, int(dups)))
        self.total_weight += int(max_weight)
        self._cascade(1)

    def _opportunistic_resolve(self) -> None:
        """Resolve pending shrinks stall-free once their stats vectors
        are computed (single-process only: readiness differs across
        hosts, and divergent dispatch orders would deadlock a multi-host
        mesh — there, resolution happens at the deterministic forced
        points: speculative-consume, depth overflow, finalize)."""
        if self.multiprocess or not self._pending:
            if len(self._pending) > 8:
                self._resolve_pending()
            return
        if all(
            getattr(p[2], "is_ready", lambda: False)()
            for p in self._pending
        ) or len(self._pending) > 8:
            self._resolve_pending()

    def _merge_rows_budget(self) -> int:
        """Max per-device input rows (axis 1) for one merge call —
        mirrors SortedCountStore._merge_rows_budget."""
        per_row = 4 * self.W + 8
        return max(2048, self._merge_bytes_budget // per_row)

    @staticmethod
    def _run_rows(r) -> int:
        return r.n_cap if isinstance(r, PackedRunBatch) else r[0].shape[1]

    def _materialize(self, run):
        """(keys, lo, hi, dups) view of a run; unpacks PackedRunBatch."""
        if isinstance(run, PackedRunBatch):
            k, l, h = unpack_run_batched(run)
            return (k, l, h, 1)
        return run

    def _maybe_pack(self, lvl: int, run):
        """Bit-pack a freshly shrunk run when the capacity mode is on and
        the run rests high enough in the forest."""
        if not (self.pack_resting and lvl >= self._pack_level):
            return run
        k, l, h, _ = run
        return pack_run_batched(k, l, h, k.shape[1], self.key_bits)

    def _cascade(self, lvl: int) -> None:
        while len(self.levels[lvl]) >= self.branch:
            # a merge must never consume an unresolved SPECULATIVE run
            # (its rowsort overflow bit is still unchecked): resolve
            # first — deterministic across processes (triggered by the
            # shared insert sequence alone)
            if any(
                p[4] is not None
                and any(p[1] is r for r in self.levels[lvl])
                for p in self._pending
            ):
                self._resolve_pending()
            level = self.levels[lvl]
            budget = self._merge_rows_budget()
            take, rows = [], 0
            for r in level:
                rr = self._run_rows(r)
                if len(take) >= 2 and rows + rr > budget:
                    break
                take.append(r)
                rows += rr
            self.levels[lvl] = level[len(take):]
            if lvl == 0:
                merged = self._merge_group(take, raw=True)
                if lvl + 1 >= len(self.levels):
                    raise RuntimeError(
                        "forest store exceeded maximum level count"
                    )
                self.levels[lvl + 1].append(merged)
            else:
                group = [self._materialize(r) for r in take]
                run, ns, retained, ri = self._merge_compact(group, rows)
                if lvl + 1 >= len(self.levels):
                    raise RuntimeError(
                        "forest store exceeded maximum level count"
                    )
                self.levels[lvl + 1].append(run)
                self._pending.append(
                    (lvl + 1, run, ns, rows, retained, ri)
                )
            # a budget-limited partial take can leave this level >=
            # branch: keep merging here before moving up
            if len(self.levels[lvl]) < self.branch:
                lvl += 1

    def _merge_compact(self, group, rows: int):
        """Compacting merge of materialized dedup runs; planned when a
        density estimate exists. Returns (run, ns_dev, retained) where
        retained is the planned path's masked arrays (for the plan-free
        recompute) or None."""
        arity = tuple(2 if r[2] is None else 3 for r in group)
        max_dups = sum(r[3] for r in group)
        args = []
        for r in group:
            args += [r[0], r[1]] + ([] if r[2] is None else [r[2]])
        # the single-chip hi rule (incl. the round-5 carry fix): keep the
        # hi limb whenever any input carries one OR total weight may
        # exceed u32 — merge_many's log-scan carries into hi even when
        # every input is a 2-tuple
        has_hi = (any(a == 3 for a in arity)
                  or self.total_weight >= (1 << 32))
        plan = self._plan_for(group, rows)
        if plan:
            self.plans_engaged += 1
            mk, ml, mh, _, ri = _merge_general_batched_fn(
                arity, self.use_vword, False, max_dups, self.key_bits,
                with_hi=has_hi,
            )(*args)
            margs = (mk, ml, mh) if has_hi else (mk, ml)
            k2, l2, h2, ns = _compact_batched_fn(
                self.key_bits, plan, has_hi, False
            )(*margs)
            retained = ("merge", has_hi, margs)
        else:
            k2, l2, h2, ns, ri = _merge_general_batched_fn(
                arity, self.use_vword, True, max_dups, self.key_bits
            )(*args)
            retained = None
        if h2 is not None and self.total_weight < (1 << 32):
            h2 = None  # counts provably fit u32: drop the limb
        return (k2, l2, h2, 1), ns, retained, ri

    def _plan_for(self, group, rows: int) -> tuple:
        """Rowsort slice plan for a merge of `rows` per-shard rows.

        Level-1 receives (uncompacted segments) plan from the observed
        max-shard density of the most recent same-class merge (coverage
        saturation makes earlier ratios over-estimates — conservative);
        groups of compacted runs plan from the union bound
        (2*max_n + 1)/rows (distinct saturates toward the per-shard
        universe; the 2x allows growth, and a misprediction costs one
        plan-free recompute, never correctness — the vmapped ovf bit).
        JF_NO_PLAN=1 disables planning for A/B runs."""
        if os.environ.get("JF_NO_PLAN"):
            return ()
        if self.density_est is not None:
            d = self.density_est
        else:
            compacted = all(r[3] == 1 for r in group)
            if compacted and self._max_n:
                d = (2.0 * self._max_n + 1.0) / max(rows, 1)
            elif not compacted and 1 in self._ratios:
                d = self._ratios[1]
            else:
                return ()
        return compaction_plan(min(1.0, self._plan_margin * d))

    def _note_overflow(self) -> None:
        self.spec_overflows += 1
        self._plan_margin = min(self._plan_margin * 1.25, 2.5)

    def _replace_run(self, lvl: int, run, new_run):
        level = self.levels[lvl]
        for j, r in enumerate(level):
            if r is run:
                level[j] = new_run
                break
        return new_run

    def _resolve_pending(self) -> None:
        pending, self._pending = self._pending, []
        for lvl, run, ns_dev, src_rows, retained, ri_dev in pending:
            stats = np.asarray(_stats_ratio_reduce(ns_dev, ri_dev))
            max_n, ovf = int(stats[0]), bool(stats[1])
            ratio = int(stats[2]) / (1 << 20)
            if ovf and retained is not None:
                self._note_overflow()
                _, has_hi, margs = retained
                k2, l2, h2, ns2 = _compact_batched_fn(
                    self.key_bits, (), has_hi, True
                )(*margs)
                if run[2] is None:
                    h2 = None  # keep the run's hi-drop decision
                run = self._replace_run(lvl, run, (k2, l2, h2, 1))
                stats = np.asarray(_stats_ratio_reduce(ns2, ri_dev))
                max_n = int(stats[0])
                ratio = int(stats[2]) / (1 << 20)
            if src_rows:
                # key by the INPUT level (pending lvl is the output):
                # _plan_for predicts a level's next merge from the most
                # recent same-class observation. The ratio is distinct /
                # REAL input rows (real-region density of the masked
                # merge output — see _merge_general_batched_fn)
                self._ratios[lvl - 1] = max(ratio, 1e-6)
            self._max_n = max(self._max_n, max_n)
            level = self.levels[lvl]
            try:
                i = next(j for j, r in enumerate(level) if r is run)
            except StopIteration:
                continue  # already consumed by a further merge
            shrunk = self._shrink_run(run, max_n)
            level[i] = self._maybe_pack(lvl, shrunk)

    def _shrink_run(self, run, n: int):
        """Truncate a compacted [P, M, ...] run to an eighth-pow2 common
        capacity >= the global max shard occupancy (same cap everywhere:
        jitted shapes stay few and identical across processes)."""
        k2, l2, h2, dups = run
        M = k2.shape[1]
        bl = max(10, (max(n, 1) - 1).bit_length())
        base = 1 << max(8, bl - 3)
        cap = base * ((max(n, 1) + base - 1) // base)
        if cap >= M:
            return run
        if h2 is None:
            k3, l3 = _shrink_batched_fn(cap, False)(k2, l2)
            return (k3, l3, None, dups)
        k3, l3, h3 = _shrink_batched_fn(cap, True)(k2, l2, h2)
        return (k3, l3, h3, dups)

    def _merge_group(self, group, raw: bool, compact: bool = False):
        # raw groups ALWAYS take the segment-length kernel: merge_raw's
        # counts are bounded by the group's row count (fits u32 regardless
        # of total ingested weight), while merge_many's log-scan requires
        # bounded duplicates; 64-bit growth is handled by the general
        # merge at higher levels
        if raw:
            args = []
            for r in group:
                args += [r[0], r[1]]
            k2, c2 = _merge_raw_batched_fn(len(group), self.use_vword)(*args)
            return (k2, c2, None, 1)
        arity = tuple(2 if r[2] is None else 3 for r in group)
        max_dups = sum(r[3] for r in group)
        args = []
        for r in group:
            args += [r[0], r[1]] + ([] if r[2] is None else [r[2]])
        k2, l2, h2, ns, _ = _merge_general_batched_fn(
            arity, self.use_vword, compact, max_dups, self.key_bits
        )(*args)
        if compact:
            return (k2, l2, h2, 1), ns
        return (k2, l2, h2, 1)

    def occupied_runs(self):
        return [r for level in self.levels for r in level]

    def device_bytes(self) -> int:
        total = 0
        for r in self.occupied_runs():
            if isinstance(r, PackedRunBatch):
                total += r.device_bytes()
                continue
            for x in r[:3]:
                if x is not None:
                    total += int(np.prod(x.shape)) * 4
        return total

    def finalize(self):
        """Returns (keys [P, M, W], lo, hi, ns [P]) compacted per shard."""
        # level-0 raw runs have unbounded duplicates: combine them via the
        # raw kernel first so the general merge only sees bounded runs
        if self.levels[0]:
            group, self.levels[0] = self.levels[0], []
            self.levels[1].append(self._merge_group(group, raw=True))
        self._resolve_pending()
        runs = self.occupied_runs()
        if not runs:
            return None
        runs = [self._materialize(r) for r in runs]
        # staged pre-merges: one merge call must never exceed the
        # per-device input budget (each stage compacts toward the
        # distinct count, so this converges in very few stages)
        budget = self._merge_rows_budget()
        while (len(runs) > 2
               and sum(r[0].shape[1] for r in runs) > budget):
            new_runs = []
            i = 0
            while i < len(runs):
                grp, rows = [runs[i]], runs[i][0].shape[1]
                i += 1
                while i < len(runs) and (
                    len(grp) < 2 or rows + runs[i][0].shape[1] <= budget
                ):
                    rows += runs[i][0].shape[1]
                    grp.append(runs[i])
                    i += 1
                if len(grp) == 1:
                    new_runs.append(grp[0])
                    continue
                run, ns, retained, _ = self._merge_compact(grp, rows)
                stats = np.asarray(_stats_reduce(ns))
                if bool(stats[1]) and retained is not None:
                    self._note_overflow()
                    _, has_hi, margs = retained
                    k2, l2, h2, ns2 = _compact_batched_fn(
                        self.key_bits, (), has_hi, True
                    )(*margs)
                    run = (k2, l2, h2 if run[2] is not None else None, 1)
                    stats = np.asarray(_stats_reduce(ns2))
                new_runs.append(self._shrink_run(run, int(stats[0])))
            if len(new_runs) >= len(runs):
                break  # runs individually huge: no further split possible
            runs = new_runs
        total_rows = sum(r[0].shape[1] for r in runs)
        run, ns, retained, _ = self._merge_compact(runs, total_rows)
        k2, l2, h2, _ = run
        ns_clean = ns
        if retained is not None:
            stats = np.asarray(_stats_reduce(ns))
            if bool(stats[1]):
                self._note_overflow()
                _, has_hi, margs = retained
                k2, l2, h2, ns_clean = _compact_batched_fn(
                    self.key_bits, (), has_hi, True
                )(*margs)
            else:
                ns_clean = _strip_ovf_bits(ns)
        if h2 is None:
            h2 = jnp.zeros_like(l2)
        self._pending = []
        for level in self.levels:
            level.clear()
        # shrink to the max shard occupancy BEFORE packing/resting: the
        # merge output is sized at total input rows (often 4-8x the
        # occupancy), which would otherwise inflate the packed resting
        # buffers exactly where capacity matters most
        max_n = int(np.asarray(_stats_reduce(ns_clean))[0])
        k2, l2, h2, _ = self._shrink_run((k2, l2, h2, 1), max_n)
        resting = (k2, l2, h2, 1)
        if self.pack_resting:
            resting = pack_run_batched(k2, l2, h2, k2.shape[1],
                                       self.key_bits)
        self.levels[-1].append(resting)
        return k2, l2, h2, ns_clean

    def reset(self):
        for level in self.levels:
            level.clear()
        self.total_weight = 0
        self._pending = []
        self._ratios = {}
        self._max_n = 0
        self.density_est = None
        self.spec_overflows = 0
        self._plan_margin = 1.2
        self.plans_engaged = 0


class ShardedMerCounter:
    """Hash-prefix sharded k-mer counter over a device mesh.

    The multi-chip equivalent of MerCounter: same sortkey order, same dump
    semantics; the table lives partitioned across all chips of the mesh.
    """

    def __init__(
        self,
        k: int,
        size: int,
        mesh: Mesh | None = None,
        canonical: bool = False,
        matrix: GF2Matrix | None = None,
        rng: np.random.Generator | None = None,
        compact_exchange: bool = True,
        mer_filter=None,
        pack_resting: bool = False,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_shards = int(self.mesh.devices.size)
        self.k = int(k)
        c = 2 * self.k
        self.W = mw.nwords(c)
        log_p = ceil_log2(self.n_shards)
        self.lsize = max(log_p, min(ceil_log2(size), c if c <= 64 else 64), 1)
        self.size = 1 << self.lsize
        self.canonical = bool(canonical)
        if matrix is not None:
            if matrix.r != self.lsize or matrix.c != c:
                raise ValueError(
                    f"matrix is {matrix.r}x{matrix.c}, need {self.lsize}x{c}"
                )
            self.matrix = matrix
        elif self.lsize == c:
            self.matrix = GF2Matrix.identity(c)
        else:
            rng = rng or np.random.default_rng()
            self.matrix = GF2Matrix.random_invertible(self.lsize, c, rng)

        if self.matrix.is_low_identity() and self.lsize == c:
            self._A = None
            self._Ainv = None
        else:
            self._A = jnp.asarray(masks_of_matrix(self.matrix, self.W))
            self._Ainv = jnp.asarray(
                inverse_masks_of_matrix(self.matrix, self.W)
            )

        self.compact_exchange = bool(compact_exchange)
        self.multiprocess = len(
            {d.process_index for d in self.mesh.devices.flat}
        ) > 1
        self._local_rows = sum(
            1 for d in self.mesh.devices.flat
            if d.process_index == jax.process_index()
        )
        self._step = _build_step(
            self.mesh, self.k, self.lsize, self.canonical,
            self._A is not None, compact=self.compact_exchange,
        )
        self._packed_steps: dict = {}
        self._masked_steps: dict = {}
        self._local_steps: dict = {}
        self._route_steps: dict = {}
        # recoverable-overflow ring: (flag, replay, store) per compact-
        # exchange step, at most _overflow_ring_depth entries. Flags are
        # only read once they are ring-depth steps old (the device has
        # long executed them — no pipeline stall); a set flag means the
        # step's contribution was zeroed ON DEVICE (_local_compact) and
        # the retained host input is re-ingested through the capacity-
        # free masked exchange. Replay holds REFERENCES to the caller's
        # arrays (every caller passes freshly-built batches).
        self._retain_ring: list = []
        self._overflow_ring_depth = 16
        self.overflow_retries = 0
        self.store = _ShardedStore(
            self.W, key_bits=c, pack_resting=pack_resting,
            multiprocess=self.multiprocess,
        )
        self._restrict_store: _ShardedStore | None = None
        # bloom-mode filter f(mers, counts) -> counts, applied ONCE per
        # shard at finalize. Output-equivalent to the single-chip
        # per-chunk application: --bc passes a mer in full or not at all
        # (stateless), and --bf's "first occurrence consumed" reduces to
        # counts-1 per distinct mer when every occurrence is already
        # aggregated (finalize-mode is the false-positive-free ideal).
        # Bloom modes filter at INGEST time (like single-chip): each
        # device's locally consolidated chunk run is recovered to mers,
        # filtered host-side, and only PASSING (key, count) pairs enter
        # the exchange and the store — so --bc/--bf-size bound device
        # memory under -d exactly as they do on one chip. Finalize-time
        # filtering remains the fallback (multi-process runs: the
        # stateful --bf filter lives per process, and only the finalize
        # path guarantees each mer is filtered exactly once, at its
        # owner shard).
        self.mer_filter = mer_filter
        self._ingest_filter = (
            mer_filter is not None and self.n_shards > 1
            and not self.multiprocess
        )
        if self._ingest_filter:
            # the ring retains DEVICE runs in this mode (re-routing must
            # not re-apply the stateful filter): keep it shallow
            self._overflow_ring_depth = 4
        self._run_sharding = NamedSharding(self.mesh, PartitionSpec(AXIS))
        # fully on-device filter application (VERDICT r4 #5: no per-chunk
        # D2H/H2D round trip); host path remains the fallback for
        # untagged filters / non-pow2 bloom sizes / multi-process
        self._dev_filter = (
            self._build_dev_filter(mer_filter) if self._ingest_filter
            else None
        )

    # -- ingestion ------------------------------------------------------------

    def add_chunks(self, chunks: np.ndarray) -> None:
        """Count the k-mers of [P, L] uint8 chunks, one per shard. Chunk
        semantics match MerCounter.add_chunk (separator bytes between reads,
        k-1 overlap between consecutive chunks of one stream)."""
        rows = self._local_rows if self.multiprocess else self.n_shards
        if chunks.ndim != 2 or chunks.shape[0] != rows:
            raise ValueError(f"expected [{rows}, L] chunks")
        sharding = NamedSharding(self.mesh, PartitionSpec(AXIS, None))
        dev = self._put(chunks, np.uint8, sharding)
        if self._ingest_filter:
            ck, ccnt = self._local_step(None)(dev)
            self._filtered_route_insert(ck, ccnt, chunks.shape[1])
            return
        keys, weights, overflow = self._step(dev, self._A)
        self._insert_step(keys, weights, max_weight=chunks.shape[1])
        self._note_step(overflow, ("ascii", chunks), self.store,
                        chunks.shape[1])

    def packed_step(self, L: int):
        """Jitted packed-ingest counting step for chunk length L: device
        -resident [P, L/16]+[P, L/32] inputs -> routed per-shard (keys,
        weights, overflow). The hash matrix is bound in. Cached per L;
        used by add_chunks_packed and pre-staged bench loops
        (bench_scaling.py)."""
        step = self._packed_steps.get(L)
        if step is None:
            raw = _build_step(
                self.mesh, self.k, self.lsize, self.canonical,
                self._A is not None, packed_L=L,
                compact=self.compact_exchange,
            )
            step = lambda pw, vb: raw(pw, vb, self._A)  # noqa: E731
            self._packed_steps[L] = step
        return step

    def add_chunks_packed(self, pwords: np.ndarray,
                          validbits: np.ndarray) -> None:
        """Packed ingest ([P, L/16] u32 codes + [P, L/32] u32 validity per
        shard): 4.25x less host->device traffic (see native pack_chunk)."""
        L = int(pwords.shape[1]) * 16
        step = self.packed_step(L)
        sharding = NamedSharding(self.mesh, PartitionSpec(AXIS, None))
        pw = self._put(pwords, np.uint32, sharding)
        vb = self._put(validbits, np.uint32, sharding)
        if self._ingest_filter:
            ck, ccnt = self._local_step(L)(pw, vb)
            self._filtered_route_insert(ck, ccnt, L)
            return
        keys, weights, overflow = step(pw, vb)
        self._insert_step(keys, weights, max_weight=L)
        self._note_step(overflow, ("packed", pwords, validbits),
                        self.store, L)

    def _insert_step(self, keys, weights, max_weight: int,
                     store: "_ShardedStore | None" = None) -> None:
        """Route one step's routed output into the store. Compact exchange:
        the [P, P*capp] receive is P concatenated sender segments, each a
        DEDUPLICATED (key, count) run — insert per-sender runs so they
        take merge_many's bounded log-scan. Masked exchange: raw {0,1}
        rows, segment-length kernel."""
        store = self.store if store is None else store
        if self.compact_exchange and self.n_shards > 1:
            store.insert_dedup(
                keys, weights, max_weight=max_weight, dups=self.n_shards
            )
        else:
            store.insert_raw(keys, weights, max_weight=max_weight)

    def restrict_to(self, chunks_iter) -> None:
        """--if mode for the sharded counter (count_main.cc:288-295
        PRIME/UPDATE semantics): the allowed mers are ingested through
        the SAME routed pipeline into a second sharded store, so every
        allowed key lands on the shard that owns it in the main table;
        finalize intersects the two per-shard sorted runs. Allowed-but-
        unseen mers dump with count 0, everything else is dropped."""
        self._restrict_store = _ShardedStore(
            self.W, key_bits=2 * self.k, multiprocess=self.multiprocess
        )
        rows = self._local_rows if self.multiprocess else self.n_shards
        sharding = NamedSharding(self.mesh, PartitionSpec(AXIS, None))
        batch: list = []

        def flush():
            if not batch:
                return
            L = len(batch[0])
            while len(batch) < rows:
                batch.append(np.full(L, ord("N"), dtype=np.uint8))
            stacked = np.stack(batch)
            dev = self._put(stacked, np.uint8, sharding)
            keys, weights, overflow = self._step(dev, self._A)
            self._insert_step(keys, weights, max_weight=rows * L,
                              store=self._restrict_store)
            self._note_step(overflow, ("ascii", stacked),
                            self._restrict_store, rows * L)
            batch.clear()

        L_seen = None
        for chunk in chunks_iter:
            chunk = np.asarray(chunk, dtype=np.uint8)
            if len(chunk) < self.k:
                continue
            if L_seen is None:
                L_seen = len(chunk)
            if len(chunk) != L_seen:
                flush()
                L_seen = len(chunk)
            batch.append(chunk)
            if len(batch) == rows:
                flush()
        flush()

    def restrict_to_multihost(self, chunks_iter, chunk_len: int) -> None:
        """Multi-host --if PRIME pass (count_main.cc:288-295): every
        exchange step is a collective, so the processes run the prime
        loop in LOCKSTEP — per round an allgathered has-data flag, with
        exhausted processes feeding all-'N' padding steps (the same
        equalization the multihost count loop uses). Each process feeds
        its own --if files; duplicate primes across processes are
        harmless (the restrict store's counts are ignored — only
        membership matters, and every key lands at its owner shard)."""
        from jax.experimental import multihost_utils as mu

        self._restrict_store = _ShardedStore(
            self.W, key_bits=2 * self.k, multiprocess=self.multiprocess
        )
        rows = self._local_rows if self.multiprocess else self.n_shards
        sharding = NamedSharding(self.mesh, PartitionSpec(AXIS, None))
        L = int(chunk_len)
        pad_chunk = np.full(L, ord("N"), dtype=np.uint8)

        def step(batch):
            while len(batch) < rows:
                batch.append(pad_chunk)
            stacked = np.stack(batch)
            dev = self._put(stacked, np.uint8, sharding)
            keys, weights, overflow = self._step(dev, self._A)
            self._insert_step(keys, weights, max_weight=rows * L,
                              store=self._restrict_store)
            self._note_step(overflow, ("ascii", stacked),
                            self._restrict_store, rows * L)

        it = iter(chunks_iter)
        batch: list = []
        while True:
            chunk = next(it, None)
            if chunk is not None:
                chunk = np.asarray(chunk, dtype=np.uint8)
                if len(chunk) < self.k:
                    continue
                if len(chunk) < L:
                    chunk = np.concatenate(
                        [chunk, pad_chunk[: L - len(chunk)]]
                    )
                batch.append(chunk[:L])
                if len(batch) < rows:
                    continue
            # round boundary: agree globally whether anyone still has
            # data; exhausted processes contribute padding steps
            have = batch or chunk is not None
            flags = mu.process_allgather(
                np.asarray([have], dtype=np.int32)
            )
            if not flags.any():
                break
            step(batch)
            batch = []

    def _put(self, arr, dtype, sharding):
        """Stage host chunks onto the mesh. Multi-process: each host
        supplies only its local rows (data-parallel host ingestion over
        DCN, SURVEY §7 step 7); single-process: plain device_put."""
        if self.multiprocess:
            local = np.ascontiguousarray(np.asarray(arr, dtype=dtype))
            global_shape = (self.n_shards,) + local.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, local, global_shape
            )
        return jax.device_put(jnp.asarray(arr, dtype=dtype), sharding)

    def step(self, chunks_dev):
        """One jitted counting step on device-resident chunks (bench path)."""
        return self._step(chunks_dev, self._A)

    # -- extraction -----------------------------------------------------------

    def _finalize_parts(self, store, with_keys: bool = False):
        """{shard_id: (keys [n, W] | None, mers [n, W], counts [n] u64)}
        for this process's non-empty shards."""
        res = store.finalize()
        if res is None:
            return {}
        keys, lo, hi, ns = res
        mers_dev = self._recover_batched(keys)
        ns_rows = _addressable_rows(ns)
        m_rows = _addressable_rows(mers_dev)
        lo_rows = _addressable_rows(lo)
        hi_rows = _addressable_rows(hi)
        k_rows = _addressable_rows(keys) if with_keys else None
        parts = {}
        for p in sorted(ns_rows):
            n = int(ns_rows[p])
            if n == 0:
                continue
            cnt = lo_rows[p][:n].astype(np.uint64) | (
                hi_rows[p][:n].astype(np.uint64) << np.uint64(32)
            )
            parts[p] = (k_rows[p][:n] if with_keys else None,
                        m_rows[p][:n], cnt)
        return parts

    def finalize_local_np(self):
        """Per-process dump segments: [(shard_id, mer limbs [n, W] u32,
        counts [n] u64), ...] for THIS process's shards, ascending
        shard_id. Concatenating all processes' segments in shard order is
        the global hash order — the multi-host dump is "each host writes
        its segment file, cat in rank order" (no cross-DCN table motion;
        replaces sorted_dumper.hpp:57-101's mer_heap/token-ring)."""
        self._resolve_overflow_ring()
        if self._restrict_store is None:
            parts = self._finalize_parts(self.store)
            out = []
            for p, (_, m, c) in sorted(parts.items()):
                if self.mer_filter is not None and not self._ingest_filter:
                    # fallback mode (1-shard / multi-process): filter at
                    # finalize, each mer exactly once at its owner shard
                    c = self.mer_filter(m, c)
                if self.mer_filter is not None:
                    keep = c > 0
                    m, c = m[keep], c[keep]
                    if len(c) == 0:
                        continue
                out.append((p, m, c))
            return out
        # --if: per shard, the PRIMED set in hash order with counted
        # values (0 when unseen); both runs are shard-local sorted under
        # the same matrix, so one vectorized binary search each
        from jellyfish_tpu.counter import _sortkey_order_view

        parts = self._finalize_parts(self.store, with_keys=True)
        aparts = self._finalize_parts(self._restrict_store, with_keys=True)
        out = []
        for p, (akeys, amers, _) in sorted(aparts.items()):
            main = parts.get(p)
            if main is None:
                out.append((p, amers,
                            np.zeros(len(amers), dtype=np.uint64)))
                continue
            keys_np, main_mers, counts = main
            if self.mer_filter is not None and not self._ingest_filter:
                counts = self.mer_filter(main_mers, counts)
            kv = _sortkey_order_view(keys_np)
            av = _sortkey_order_view(akeys)
            pos = np.minimum(np.searchsorted(kv, av), len(kv) - 1)
            match = kv[pos] == av
            out.append((p, amers,
                        np.where(match, counts[pos], np.uint64(0))))
        return out

    def finalize_np(self):
        """Single-process view of finalize_local_np: (mer limbs [n, W]
        uint32, counts [n] uint64) in GLOBAL hash order. Multi-process
        callers must use finalize_local_np (other processes' shards are
        not addressable here)."""
        if self.multiprocess:
            raise RuntimeError(
                "finalize_np needs every shard addressable; use "
                "finalize_local_np per process in multi-host runs"
            )
        empty = (np.zeros((0, self.W), dtype=np.uint32),
                 np.zeros(0, dtype=np.uint64))
        parts = self.finalize_local_np()
        if not parts:
            return empty
        return (
            np.concatenate([m for _, m, _ in parts], axis=0),
            np.concatenate([c for _, _, c in parts], axis=0),
        )

    def _recover_batched(self, keys):
        return _recover_mers_batched(
            keys, self._Ainv, k=self.k, lsize=self.lsize
        )

    def _note_step(self, flag, replay, store, max_weight: int) -> None:
        """Track a compact-exchange step for recoverable overflow. The
        flag is only read once it is ring-depth steps old (the device has
        executed it by then — no pipeline stall); a set flag means the
        step contributed NOTHING (zeroed on device) and its retained
        input is re-ingested through the capacity-free masked exchange.
        The masked paths (compact_exchange=False, 1-shard meshes) cannot
        overflow and are not tracked."""
        if not (self.compact_exchange and self.n_shards > 1):
            return
        self._retain_ring.append((flag, replay, store, max_weight))
        while len(self._retain_ring) > self._overflow_ring_depth:
            self._resolve_oldest()

    def _resolve_overflow_ring(self) -> None:
        """Drain the ring (finalize/reset); replays any flagged steps."""
        while self._retain_ring:
            self._resolve_oldest()

    def _resolve_oldest(self) -> None:
        flag, replay, store, max_weight = self._retain_ring.pop(0)
        # post-psum the flag is the GLOBAL overflow count, identical on
        # every shard: reading any addressable shard is enough
        if not np.asarray(flag.addressable_shards[0].data).any():
            return
        self.overflow_retries += 1
        sharding = NamedSharding(self.mesh, PartitionSpec(AXIS, None))
        if replay[0] in ("routed", "routed_bf"):
            # already-filtered per-shard runs: re-route with doubled
            # capacity (capp clamps at N, so this terminates capacity-
            # free; re-running the raw chunk would re-apply the stateful
            # filter). routed_bf re-runs the owner-side dedup+filter on
            # the replayed receive (the zeroed original never touched
            # the bit state).
            ck, ccnt = replay[1], replay[2]
            mult = 2
            while True:
                keys, weights, ov = self._route(mult)(ck, ccnt)
                if not np.asarray(ov.addressable_shards[0].data).any():
                    break
                mult *= 2
            if replay[0] == "routed_bf":
                self._bf_dedup_filter_insert(keys, weights, max_weight)
            else:
                self._insert_step(keys, weights, max_weight=max_weight)
            return
        if replay[0] == "ascii":
            chunks = replay[1]
            dev = self._put(chunks, np.uint8, sharding)
            keys, weights, _ = self._masked_step(None)(dev)
        else:
            pw = self._put(replay[1], np.uint32, sharding)
            vb = self._put(replay[2], np.uint32, sharding)
            L = int(replay[1].shape[1]) * 16
            keys, weights, _ = self._masked_step(L)(pw, vb)
        # masked receives are raw {0,1}-weight runs regardless of the
        # primary exchange mode
        store.insert_raw(keys, weights, max_weight=max_weight)

    def _local_step(self, L: int | None):
        """Per-shard consolidate+compact WITHOUT routing (the first half
        of the ingest-filter flow); cached per chunk length."""
        step = self._local_steps.get(L)
        if step is None:
            raw = _build_step(
                self.mesh, self.k, self.lsize, self.canonical,
                self._A is not None, packed_L=L, stage="local",
            )
            if L is None:
                step = lambda a: raw(a, self._A)  # noqa: E731
            else:
                step = lambda a, b: raw(a, b, self._A)  # noqa: E731
            self._local_steps[L] = step
        return step

    def _route(self, cap_mult: int = 1):
        """Route a per-shard compacted (keys, counts) run (the second
        half of the ingest-filter flow; cap_mult > 1 = overflow replay)."""
        step = self._route_steps.get(cap_mult)
        if step is None:
            step = _build_step(
                self.mesh, self.k, self.lsize, self.canonical,
                self._A is not None, stage="route", cap_mult=cap_mult,
            )
            self._route_steps[cap_mult] = step
        return step

    def _build_dev_filter(self, filt):
        """Promote a capability-tagged bloom filter (bloom.py
        load_count_filter) to device state: --bc replicates the cells
        (stateless check, byte-identical to the host path for pow2 m);
        --bf keeps a PER-OWNER-SHARD bit state of pow2 size (each mer is
        filtered at its owner, so states partition the key space)."""
        kind = getattr(filt, "kind", None)
        bloom = getattr(filt, "bloom", None)
        if kind is None or bloom is None:
            return None
        rep = NamedSharding(self.mesh, PartitionSpec())
        if kind == "bc":
            m = bloom.m
            if m & (m - 1) or m > (1 << 31):
                return None  # non-pow2 cells (e.g. reference-built bc
                # files): mask probes would diverge — host fallback
            cells = jax.device_put(jnp.asarray(bloom.cells), rep)
            A1 = jax.device_put(jnp.asarray(bloom.m1.bit_matrix()), rep)
            A2 = jax.device_put(jnp.asarray(bloom.m2.bit_matrix()), rep)
            return ["bc", cells, A1, A2, bloom.nb_hashes,
                    (m - 1).bit_length()]
        if kind == "bf":
            logm = max(10, (bloom.m - 1).bit_length())
            if logm > 30:
                return None
            bits = jax.device_put(
                jnp.zeros((self.n_shards, 1 << logm), dtype=bool),
                NamedSharding(self.mesh, PartitionSpec(AXIS, None)),
            )
            A1 = jax.device_put(jnp.asarray(bloom.m1.bit_matrix()), rep)
            A2 = jax.device_put(jnp.asarray(bloom.m2.bit_matrix()), rep)
            return ["bf", bits, A1, A2, bloom.nb_hashes, logm]
        return None

    def _filtered_route_insert(self, ck, ccnt, max_weight: int) -> None:
        """Apply the bloom filter to the per-shard deduplicated run, then
        route only PASSING pairs (count > 0) into the store. Exactly the
        single-chip per-chunk semantics (counter.add_chunk), shard-wise.
        With a promoted device filter, everything stays on device (no
        per-chunk host fetch)."""
        if self._dev_filter is not None:
            kind = self._dev_filter[0]
            if kind == "bc":
                _, cells, A1, A2, nb, logm = self._dev_filter
                ccnt2 = _bc_check_batched_fn(
                    nb, logm, self.k, self.lsize
                )(ck, ccnt, cells, self._Ainv, A1, A2)
                keys, weights, overflow = self._route(1)(ck, ccnt2)
                self._insert_step(keys, weights, max_weight=max_weight)
                self._note_step(overflow, ("routed", ck, ccnt2),
                                self.store, max_weight)
            else:
                # --bf: route unfiltered, dedup the receive, filter at
                # the owner (per-owner persistent state). An overflowed
                # step's receive is already zeroed on device — the
                # filter no-ops on it and the ring replays the step.
                keys, weights, overflow = self._route(1)(ck, ccnt)
                self._bf_dedup_filter_insert(keys, weights, max_weight)
                self._note_step(overflow, ("routed_bf", ck, ccnt),
                                self.store, max_weight)
            return
        mers = self._recover_batched(ck)
        m_rows = _addressable_rows(mers)
        c_rows = _addressable_rows(ccnt)
        new_rows = np.stack([
            self.mer_filter(m_rows[p], c_rows[p]).astype(np.uint32)
            for p in sorted(c_rows)
        ])
        sharding = NamedSharding(self.mesh, PartitionSpec(AXIS, None))
        ccnt2 = self._put(new_rows, np.uint32, sharding)
        keys, weights, overflow = self._route(1)(ck, ccnt2)
        self._insert_step(keys, weights, max_weight=max_weight)
        self._note_step(overflow, ("routed", ck, ccnt2), self.store,
                        max_weight)

    def _bf_dedup_filter_insert(self, keys, weights,
                                max_weight: int) -> None:
        """Dedup a routed receive (P sender segments -> dense per-owner
        run), apply the device --bf filter against the owner's bit
        state, insert the filtered run (dups=1)."""
        dk, dl, _, _, _ = _merge_general_batched_fn(
            (2,), self.store.use_vword, True, self.n_shards, 2 * self.k
        )(keys, weights)
        _, bits, A1, A2, nb, logm = self._dev_filter
        newc, bits2 = _bf_filter_batched_fn(
            nb, logm, self.k, self.lsize
        )(dk, dl, bits, self._Ainv, A1, A2)
        self._dev_filter[1] = bits2
        self.store.insert_dedup(dk, newc, max_weight=max_weight, dups=1)

    def _masked_step(self, L: int | None):
        """Capacity-free masked-exchange step (the overflow retry path);
        built lazily per chunk length and cached."""
        step = self._masked_steps.get(L)
        if step is None:
            raw = _build_step(
                self.mesh, self.k, self.lsize, self.canonical,
                self._A is not None, packed_L=L, compact=False,
            )
            if L is None:
                step = lambda a: raw(a, self._A)  # noqa: E731
            else:
                step = lambda a, b: raw(a, b, self._A)  # noqa: E731
            self._masked_steps[L] = step
        return step

    def finalize(self):
        """(mers object ints, counts uint64) — scripting convenience over
        finalize_np."""
        mers, counts = self.finalize_np()
        if len(counts) == 0:
            return np.zeros(0, dtype=object), counts
        return mw.to_ints(mers), counts

    def reset(self) -> None:
        self._retain_ring = []
        self.store.reset()
