"""Pallas gap-removal compaction of SORTED masked counted runs.

The store's compaction inputs (consolidate_premasked / merge_many masked
outputs) are already SORTED by key: real rows (count != 0) sit in
ascending key order with PAD rows (count 0) interspersed. Compaction is
therefore ORDER-PRESERVING gap removal — no comparator network needed at
all, unlike the lax.sort-based compact_counted (4.3 ms/M global, 2.25
with rowsort plans; experiments/cond_fallback_probe.py).

Division of labour (found the hard way — PERF.md "Pallas compaction"
notes: per-tile scalar work inside Mosaic costs ~2-4 us/tile and
dominates everything else):

  - XLA precomputes, in one fused pass over the counts: the within-tile
    destination index of every row (dst = tile-local cumsum(keep) - 1,
    shipped as an extra i32 row of the transposed data array) and the
    128-QUANTIZED global output offset of every tile (a tiny [n_tiles]
    cumsum, shipped as a VMEM side table);
  - the pallas kernel walks BLOCKs on the sequential grid and per TILE
    does ONLY lane-parallel work: build the one-hot selection matrix
    P[j, i] = (dst[i] == j) & keep[i] straight from the lane-oriented
    dst row (no transposes, no in-kernel cumsum), apply it with ONE
    NT-matmul (dot_general contracting both dim-1s — the TPU idiom for
    data-dependent movement; VPU/MXU have no scatter), and vector-store
    the tile at its quantized block-local offset (Mosaic requires
    provably 128-aligned dynamic lane offsets — pl.multiple_of carries
    the proof, quantization makes it true). Data rides as u8
    quarter-limbs so the MXU's native bf16-mantissa pass is exact with
    no multi-pass precision escape;
  - one DMA per block writes BLOCK rows at the block's (aligned) global
    offset; later blocks overwrite their predecessors' PAD tails
    (sequential grid), and the LAST block PAD-fills everything past its
    own write with clamped-offset PAD DMAs (they start at or past the
    first unwritten row, so they can never touch real rows).

QUANTIZED output contract: reals stay in ascending order but up to 127
PAD rows may intersperse at tile boundaries — harmless downstream
(dedup-level merges accept masked runs; the once-per-job finalize
compaction uses the exact sort path), and the total length is bounded by
true_n + M/8 at TILE=1024, so truncation keeps memory tracking the
distinct count.

Requirements: M % BLOCK == 0 (the store pads consolidation outputs to a
power of two) and a masked input (count-0 rows carry any key; they are
dropped by POSITION, not key pattern, so a genuine all-ones key with
count > 0 survives — same guarantee as compact_counted).

STATUS: ARCHIVED EXPERIMENT (round 4) — correct on chip but NOT wired
into the store. Measured on the real v5 lite chip at 2^24 rows, 25%
density (experiments/pallas_compact_probe.py + this file's history):

  lax.sort compact_counted plan=()         4.29 ms/M
  lax.sort compact_counted rowsort plan    2.25 ms/M   <- production
  pallas, u16 halves + HIGHEST matmul      4.42 ms/M
  pallas, u8 quarters + native bf16 pass   3.95 ms/M
  pallas, XLA-precomputed dst/offsets      2.80 ms/M all-in
  pallas kernel core alone (no pre/post)   3.09 ms/M

The irreducible cost is ~2.5-3 us of Mosaic per-TILE overhead (small-
matmul issue latency + loop-carried scalar dependencies), which exceeds
the entire per-tile budget. The XLA sort's 2.25 ms/M stands. Mosaic
facts learned (for the next attempt): no cumsum/dynamic_slice-on-values
lowering; vector stores and VMEM DMA slices need PROVABLY 128-aligned
lane offsets (pl.multiple_of; hence the 128-quantized placement);
dim-0 slices must align to the (4,128) tiling; f32 jnp.dot runs at
bf16 mantissa unless Precision.HIGHEST (3 passes); scoped VMEM defaults
to 16M (CompilerParams vmem_limit_bytes raises it); [1,N] 1-D stacks of
mixed-layout slices fail ("offset mismatch on non-concat dimension").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compact_sorted_masked", "pallas_compact_available", "BLOCK"]

# TILE: rows per one-hot matmul; BLOCK: rows per grid step / output DMA
TILE = 1024
BLOCK_TILES = 32
BLOCK = TILE * BLOCK_TILES  # 32768 rows per grid step
QUANT = 128  # output offsets quantize to the vector-store lane tile


def _cpad(W: int) -> int:
    """Transposed-data row count: W limbs + count + dst, padded to 4
    (VMEM slice alignment). Pad rows carry zeros end to end."""
    return ((W + 2 + 3) // 4) * 4


def pallas_compact_available(M: int, W: int,
                             backend: str | None = None) -> bool:
    """The kernel needs block-aligned inputs and a real TPU (interpret
    mode is test-only). The store pads grain shapes to powers of two."""
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and M % BLOCK == 0 and M >= BLOCK


def _kernel(data_ref, loff_ref, out_ref, stage, pad, sem, *, W, M):
    """One grid step = one BLOCK of rows, transposed layout.

    data_ref [CP, BLOCK] i32: W key-limb rows, the count row, the
    within-tile dst row (XLA-precomputed), zero pad rows. loff_ref
    [n_tiles, 1] i32 (VMEM table): 128-quantized global output offset
    per tile. out_ref [CP, M]: full HBM output, manual DMA (key rows +
    count row are meaningful; the dst/pad rows carry garbage the caller
    drops). stage/pad: [CP, BLOCK] VMEM staging / PAD blocks.
    """
    g = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    CP = _cpad(W)
    mask8 = jnp.int32(0xFF)

    @pl.when(g == 0)
    def _():
        pad[:] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (CP, BLOCK), 0) < W,
            jnp.int32(-1), jnp.int32(0),
        )

    # prefill staging with PAD: rows not overwritten by tile results
    # must read as PAD downstream
    stage[:] = pad[:]

    block_off = pl.multiple_of(loff_ref[g * BLOCK_TILES, 0], QUANT)

    def tile_body(t, _):
        sl = pl.ds(t * TILE, TILE)
        a = data_ref[:, sl]                     # [CP, TILE] i32
        cnt_row = a[W : W + 1, :]               # [1, TILE]
        dst_row = a[W + 1 : W + 2, :]           # [1, TILE]
        keep_row = cnt_row != 0
        # u8 quarter-limbs: values <= 255 are exact through the MXU's
        # native bf16-mantissa pass
        q0 = (a & mask8).astype(jnp.float32)
        q1 = (jax.lax.shift_right_logical(a, 8) & mask8).astype(
            jnp.float32)
        q2 = (jax.lax.shift_right_logical(a, 16) & mask8).astype(
            jnp.float32)
        q3 = jax.lax.shift_right_logical(a, 24).astype(jnp.float32)
        src = jnp.concatenate([q0, q1, q2, q3], axis=0)  # [4CP, TILE]

        # P[j, i] = 1 iff input row i lands at output row j — built
        # directly from the lane-oriented dst row, no transposes
        rows_j = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        P = jnp.where(
            (rows_j == dst_row) & keep_row,
            jnp.float32(1.0), jnp.float32(0.0),
        )
        # NT-matmul: contract src dim 1 with P dim 1 -> [4CP, TILE_out]
        moved = jax.lax.dot_general(
            src, P, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        packed = (
            jax.lax.shift_left(moved[3 * CP :, :], 24)
            | jax.lax.shift_left(moved[2 * CP : 3 * CP, :], 16)
            | jax.lax.shift_left(moved[CP : 2 * CP, :], 8)
            | moved[:CP, :]
        )                                        # [CP, TILE] u32 bits
        # dead output columns got no source: their count recombines to
        # 0 — force the key rows to the PAD pattern there (input reals
        # always have count > 0, so live == has-a-source)
        live = packed[W : W + 1, :] != 0
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (CP, 1), 0)
        pad_col = jnp.where(iota_c < W, jnp.int32(-1), jnp.int32(0))
        out_tile = jnp.where(live, packed, pad_col)

        loc = pl.multiple_of(
            loff_ref[g * BLOCK_TILES + t, 0] - block_off, QUANT
        )
        stage[:, pl.ds(loc, TILE)] = out_tile
        return 0

    jax.lax.fori_loop(0, BLOCK_TILES, tile_body, 0)

    # block DMA: staged rows -> out[:, block_off : block_off + BLOCK);
    # the next block overwrites this block's PAD tail (sequential grid)
    d = pltpu.make_async_copy(
        stage, out_ref.at[:, pl.ds(block_off, BLOCK)], sem.at[0]
    )
    d.start()
    d.wait()

    # the last block PAD-fills [base, M): no data DMA ever writes there
    # (base is the first unwritten column); clamped offsets stay inside
    # the buffer and overlapping PAD writes are harmless
    @pl.when(g == n_blocks - 1)
    def _():
        base = block_off + BLOCK
        n_pads = pl.cdiv(jnp.maximum(M - base, 0), BLOCK)

        def pad_body(i, _):
            off = pl.multiple_of(
                jnp.minimum(base + i * BLOCK, M - BLOCK), QUANT
            )
            p = pltpu.make_async_copy(
                pad, out_ref.at[:, pl.ds(off, BLOCK)], sem.at[1]
            )
            p.start()
            p.wait()
            return 0

        jax.lax.fori_loop(0, n_pads, pad_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _compact_pallas(keys, counts, interpret: bool = False):
    M, W = keys.shape
    CP = _cpad(W)
    n_tiles = M // TILE
    keys_i = jax.lax.bitcast_convert_type(keys, jnp.int32)
    cnt_i = jax.lax.bitcast_convert_type(counts, jnp.int32)

    # XLA prepass (fused elementwise + tiny cumsums): within-tile dst
    # per row, quantized global offset per tile
    keep = (counts != 0).astype(jnp.int32).reshape(n_tiles, TILE)
    dst = jnp.cumsum(keep, axis=1) - 1          # [n_tiles, TILE]
    c_t = dst[:, TILE - 1] + 1                  # reals per tile
    c_q = (c_t + (QUANT - 1)) & ~jnp.int32(QUANT - 1)
    csum = jnp.cumsum(c_q)
    loff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), csum[:-1]]
    ).reshape(n_tiles, 1)
    q_len = csum[-1]

    parts = [keys_i.T, cnt_i.reshape(1, M), dst.reshape(1, M)]
    if CP > W + 2:
        parts.append(jnp.zeros((CP - W - 2, M), dtype=jnp.int32))
    data_t = jnp.concatenate(parts, axis=0)     # [CP, M]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(M // BLOCK,),
        in_specs=[
            pl.BlockSpec((CP, BLOCK), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # loff, resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((CP, BLOCK), jnp.int32),
            pltpu.VMEM((CP, BLOCK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_t = pl.pallas_call(
        functools.partial(_kernel, W=W, M=M),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CP, M), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # headroom for the [TILE, TILE] selection-matrix temporaries
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(data_t, loff)
    out_keys = jax.lax.bitcast_convert_type(out_t[:W, :].T, jnp.uint32)
    out_cnt = jax.lax.bitcast_convert_type(out_t[W, :], jnp.uint32)
    return out_keys, out_cnt, q_len.astype(jnp.uint32)


def compact_sorted_masked(keys, counts, *, interpret: bool = False):
    """Gap-removal compaction of a SORTED masked counted run.

    keys [M, W] uint32 (ascending among real rows), counts [M] uint32
    (0 = PAD row, dropped by position). Returns (keys, counts, q) with
    the real rows in ascending order within the prefix [0, q) — 128-
    QUANTIZED: up to 127 PAD rows may intersperse at tile boundaries
    (see module docstring) — pure PAD (all-ones keys, count 0) after q.
    q is a device u32 scalar upper bound on the rows holding reals; the
    true distinct count is jnp.sum(counts != 0), unchanged by this op.
    A valid MASKED run for merge_many; NOT the dense-prefix contract of
    compact_counted (use that for the final dump ordering).
    """
    return _compact_pallas(keys, counts, interpret=interpret)
