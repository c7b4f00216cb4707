"""Pallas gap-removal compaction of SORTED masked counted runs.

The store's compaction inputs (consolidate_premasked / merge_many masked
outputs) are already SORTED by key: real rows (count != 0) sit in
ascending key order with PAD rows (count 0) interspersed. Compaction is
therefore ORDER-PRESERVING gap removal — no comparator network needed at
all, unlike the lax.sort-based compact_counted (4.3 ms/M global, 2.25
with rowsort plans; experiments/cond_fallback_probe.py). This kernel does
it at ~HBM bandwidth:

  - the sequential TPU grid walks BLOCKs of rows; a running output
    offset lives in SMEM scratch across grid steps (no prepass, no
    scalar prefetch — the whole op is one fused pallas_call);
  - per TILE inside a block, the within-tile compaction permutation is
    built as a one-hot [TILE, TILE] f32 matrix (dst = cumsum(keep) - 1)
    and applied with ONE MXU matmul — the TPU idiom for data-dependent
    movement (no scatter unit; a selection-matrix matmul IS the gather).
    The matmul runs TRANSPOSED ([rows(8), TILE] @ [TILE, TILE]) so the
    tiny operand count (2W+2 u16 half-limb rows) pads to 8 sublanes
    instead of 128 lanes — 1.3x MAC waste instead of 21x. Each output
    row receives exactly one input row, so f32 is exact;
  - tile results land in a VMEM staging buffer at their block-local
    offsets; later tiles overwrite earlier tiles' PAD tails (the in-block
    loop is sequential, so overwrite order is defined);
  - one DMA per block writes BLOCK rows at the block's global offset;
    later blocks overwrite their predecessors' PAD tails the same way
    (sequential grid). The LAST block PAD-fills everything past its own
    write with clamped-offset PAD DMAs (they start at or past the first
    unwritten row, so they can never touch real rows).

Requirements: M % BLOCK == 0 (the store pads consolidation outputs to a
power of two) and a masked input (count-0 rows carry any key; they are
dropped by POSITION, not key pattern, so a genuine all-ones key with
count > 0 survives — same guarantee as compact_counted).

Fallback: anything that cannot run the kernel (CPU tests, small runs,
unaligned shapes) uses ops.count.compact_counted — identical output
contract (reals ascending in the dense prefix, PAD rows after).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compact_sorted_masked", "pallas_compact_available", "BLOCK"]

# TILE: rows per one-hot matmul; BLOCK: rows per grid step / output DMA
TILE = 512
BLOCK_TILES = 64
BLOCK = TILE * BLOCK_TILES  # 32768 rows per grid step


def pallas_compact_available(M: int, W: int,
                             backend: str | None = None) -> bool:
    """The kernel needs block-aligned inputs and a real TPU (interpret
    mode is test-only). The store pads grain shapes to powers of two."""
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and M % BLOCK == 0 and M >= BLOCK


def _kernel(keys_ref, cnt_ref, out_keys_ref, out_cnt_ref, out_n_ref,
            off_smem, stage, pad, sem, *, W, M):
    """One grid step = one BLOCK of rows.

    keys_ref [BLOCK, W] i32 (u32 bits), cnt_ref [BLOCK, 1] i32.
    out_keys_ref [M, W], out_cnt_ref [M, 1]: full HBM outputs (manual
    DMA). out_n_ref [1, 1] SMEM: total real count (valid after the last
    step). stage/pad: [BLOCK, W + 1] VMEM staging and PAD-pattern blocks.
    """
    g = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    C = W + 1  # staged columns: W key limbs + count

    @pl.when(g == 0)
    def _():
        off_smem[0] = 0
        pad[:] = jnp.concatenate(
            [jnp.full((BLOCK, W), -1, dtype=jnp.int32),
             jnp.zeros((BLOCK, 1), dtype=jnp.int32)],
            axis=1,
        )

    block_off = off_smem[0]

    # prefill staging with PAD: rows not overwritten by tile results
    # (the [c_block, BLOCK) tail) must read as PAD downstream
    stage[:] = pad[:]

    cnt_block = cnt_ref[:]                      # [BLOCK, 1]
    keep2 = cnt_block != 0                      # [BLOCK, 1]
    tile_counts = jnp.sum(
        keep2.reshape(BLOCK_TILES, TILE).astype(jnp.int32), axis=1
    )                                           # [BLOCK_TILES]
    tile_offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tile_counts)[:-1]]
    )
    c_block = tile_offs[BLOCK_TILES - 1] + tile_counts[BLOCK_TILES - 1]

    mask16 = jnp.int32(0xFFFF)

    def tile_body(t, _):
        sl = pl.ds(t * TILE, TILE)
        keep_t = keep2[sl, :]                   # [TILE, 1]
        kt = keys_ref[sl, :]                    # [TILE, W] i32 bits
        ct = cnt_block[sl, :]                   # [TILE, 1]
        # u16 half-limb rows, transposed: [2(W+1), TILE] f32 (pads to 8
        # sublanes on the MXU instead of 128 lanes)
        halves = []
        for w in range(W):
            col = kt[:, w]
            halves.append(col & mask16)
            halves.append(jax.lax.shift_right_logical(col, 16))
        cc = ct[:, 0]
        halves.append(cc & mask16)
        halves.append(jax.lax.shift_right_logical(cc, 16))
        src = jnp.stack(halves, axis=0).astype(jnp.float32)  # [2C, TILE]

        dst = jnp.cumsum(keep_t[:, 0].astype(jnp.int32)) - 1   # [TILE]
        # PT[i, j] = 1 iff input row i lands at output row j
        cols_j = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        PT = jnp.where(
            (cols_j == dst[:, None]) & keep_t,
            jnp.float32(1.0), jnp.float32(0.0),
        )
        moved = jnp.dot(
            src, PT, preferred_element_type=jnp.float32
        ).astype(jnp.int32)                      # [2C, TILE]
        # recombine u16 halves -> u32 bits; unused output rows (>= c_t)
        # are all-zero (no source) -> forced to PAD below
        out_cols = []
        for c in range(C):
            lo = moved[2 * c, :]
            hi = moved[2 * c + 1, :]
            out_cols.append(jax.lax.shift_left(hi, 16) | lo)
        packed = jnp.stack(out_cols, axis=1)     # [TILE, C]

        c_t = tile_counts[t]
        live = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0) < c_t
        pad_row = jnp.concatenate(
            [jnp.full((TILE, W), -1, dtype=jnp.int32),
             jnp.zeros((TILE, 1), dtype=jnp.int32)],
            axis=1,
        )
        stage[pl.ds(tile_offs[t], TILE), :] = jnp.where(
            live, packed, pad_row
        )
        return 0

    jax.lax.fori_loop(0, BLOCK_TILES, tile_body, 0)

    off_smem[0] = block_off + c_block
    out_n_ref[0, 0] = block_off + c_block

    # block DMA: staged rows -> out[block_off : block_off + BLOCK); the
    # next block overwrites this block's PAD tail (sequential grid)
    dk = pltpu.make_async_copy(
        stage.at[:, :W], out_keys_ref.at[pl.ds(block_off, BLOCK), :],
        sem.at[0],
    )
    dc = pltpu.make_async_copy(
        stage.at[:, W:], out_cnt_ref.at[pl.ds(block_off, BLOCK), :],
        sem.at[1],
    )
    dk.start()
    dc.start()
    dk.wait()
    dc.wait()

    # the last block PAD-fills [base, M): no data DMA ever writes there
    # (base is the first unwritten row), and clamping keeps pads inside
    # the buffer — overlapping PAD writes are harmless
    @pl.when(g == n_blocks - 1)
    def _():
        base = block_off + BLOCK
        n_pads = pl.cdiv(jnp.maximum(M - base, 0), BLOCK)

        def pad_body(i, _):
            off = jnp.minimum(base + i * BLOCK, M - BLOCK)
            pk = pltpu.make_async_copy(
                pad.at[:, :W], out_keys_ref.at[pl.ds(off, BLOCK), :],
                sem.at[0],
            )
            pc = pltpu.make_async_copy(
                pad.at[:, W:], out_cnt_ref.at[pl.ds(off, BLOCK), :],
                sem.at[1],
            )
            pk.start()
            pc.start()
            pk.wait()
            pc.wait()
            return 0

        jax.lax.fori_loop(0, n_pads, pad_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _compact_pallas(keys, counts, interpret: bool = False):
    M, W = keys.shape
    keys_i = jax.lax.bitcast_convert_type(keys, jnp.int32)
    cnt_i = jax.lax.bitcast_convert_type(counts, jnp.int32).reshape(M, 1)

    grid_spec = pl.GridSpec(
        grid=(M // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    out_keys, out_cnt, n = pl.pallas_call(
        functools.partial(_kernel, W=W, M=M),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((M, W), jnp.int32),
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((BLOCK, W + 1), jnp.int32),
            pltpu.VMEM((BLOCK, W + 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(keys_i, cnt_i)
    return (
        jax.lax.bitcast_convert_type(out_keys, jnp.uint32),
        jax.lax.bitcast_convert_type(out_cnt[:, 0], jnp.uint32),
        n[0, 0].astype(jnp.uint32),
    )


def compact_sorted_masked(keys, counts, *, interpret: bool = False):
    """Gap-removal compaction of a SORTED masked counted run.

    keys [M, W] uint32 (ascending among real rows), counts [M] uint32
    (0 = PAD row, dropped by position). Returns (keys, counts, n) with
    the real rows in the dense ascending prefix, PAD (all-ones keys,
    count 0) after, and n the real count (device u32 scalar) — the
    compact_counted contract restricted to sorted inputs (lo-only
    counts, which is all the store's grain runs carry).
    """
    return _compact_pallas(keys, counts, interpret=interpret)
