"""Probe 2: resolve the three unknowns of the Pallas merge/compact kernel.

1. TRUE per-stage compare-exchange cost (probe 1's 20 stages vanished in
   ~2ms dispatch noise): 200 stages over 1M elements, 1-array and
   3-array (2 key limbs + payload) variants.
2. Element-granular (unaligned) dynamic-offset DMA HBM->VMEM: merge-path
   split points are not 128-aligned.
3. pltpu.roll with a DYNAMIC shift (carry-buffer compaction needs it if
   DMA must stay aligned).

Correctness is asserted where cheap; timings use fetch-forced syncs.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

R, C = 4096, 128  # 512K u32 elements (VMEM-bounded working set)


def sync(x):
    if isinstance(x, (tuple, list)):
        x = x[0]
    np.asarray(x.ravel()[:1])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def _xchg1(x, m):
    y = x.reshape(R // (2 * m), 2, m, C)
    lo, hi = y[:, 0], y[:, 1]
    swap = hi < lo
    mn = jnp.where(swap, hi, lo)
    mx = jnp.where(swap, lo, hi)
    return jnp.stack([mn, mx], axis=1).reshape(R, C)


def _xchg3(kh, kl, cnt, m):
    sh = (R // (2 * m), 2, m, C)
    yh, yl, yc = kh.reshape(sh), kl.reshape(sh), cnt.reshape(sh)
    ah, bh = yh[:, 0], yh[:, 1]
    al, bl = yl[:, 0], yl[:, 1]
    ac, bc = yc[:, 0], yc[:, 1]
    swap = (bh < ah) | ((bh == ah) & (bl < al))
    mnh = jnp.where(swap, bh, ah)
    mxh = jnp.where(swap, ah, bh)
    mnl = jnp.where(swap, bl, al)
    mxl = jnp.where(swap, al, bl)
    mnc = jnp.where(swap, bc, ac)
    mxc = jnp.where(swap, ac, bc)
    out = []
    for mn, mx in ((mnh, mxh), (mnl, mxl), (mnc, mxc)):
        out.append(jnp.stack([mn, mx], axis=1).reshape(R, C))
    return out


def build_stages(n_stages, arrays):
    if arrays == 1:
        def kernel(x_ref, o_ref):
            # write each stage through the ref: bounds Mosaic's live set
            # (fully chained stages OOM'd scoped vmem at 50 stages)
            o_ref[:] = x_ref[:]
            s = R // 2
            for i in range(n_stages):
                o_ref[:] = _xchg1(o_ref[:], max(s, 1))
                s = s // 2 or R // 2

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        return f

    def kernel(a_ref, b_ref, c_ref, oa, ob, oc):
        oa[:], ob[:], oc[:] = a_ref[:], b_ref[:], c_ref[:]
        s = R // 2
        for i in range(n_stages):
            kh, kl, cnt = _xchg3(oa[:], ob[:], oc[:], max(s, 1))
            oa[:], ob[:], oc[:] = kh, kl, cnt
            s = s // 2 or R // 2

    @jax.jit
    def f(kh, kl, cnt):
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((R, C), jnp.uint32)] * 3,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        )(kh, kl, cnt)

    return f


def test_stage_cost(rng):
    x = jnp.asarray(rng.integers(0, 1 << 32, (R, C), dtype=np.uint32))
    t0 = timeit(build_stages(0, 1), x)
    print(f"[stages-1] passthrough {t0*1e3:.2f}ms", flush=True)
    for n in (50, 200):
        t = timeit(build_stages(n, 1), x)
        per = (t - t0) / n
        print(
            f"[stages-1] {n}: {t*1e3:7.2f}ms -> {per/0.524288*1e3:.4f}ms/M/stage",
            flush=True,
        )
    a = jnp.asarray(rng.integers(0, 1 << 32, (R, C), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, (R, C), dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 1 << 32, (R, C), dtype=np.uint32))
    t0 = timeit(build_stages(0, 3), a, b, c)
    print(f"[stages-3] passthrough {t0*1e3:.2f}ms", flush=True)
    for n in (50, 200):
        t = timeit(build_stages(n, 3), a, b, c)
        per = (t - t0) / n
        print(
            f"[stages-3] {n}: {t*1e3:7.2f}ms -> {per/0.524288*1e3:.4f}ms/M/stage",
            flush=True,
        )


def test_unaligned_dma(rng):
    N, BLK = 1 << 16, 4096

    def kernel(off_ref, hbm_ref, o_ref, scratch, sem):
        off = off_ref[0]
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(off, BLK)], scratch, sem
        )
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK,), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    @jax.jit
    def f(off, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BLK,), jnp.uint32),
            grid_spec=grid_spec,
        )(off, x)

    x = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
    for off in (0, 128, 131, 7777):
        try:
            got = np.asarray(f(jnp.asarray([off], dtype=jnp.int32), x))
            ok = (got == np.asarray(x)[off : off + BLK]).all()
            print(f"[dma] offset {off}: {'OK' if ok else 'WRONG DATA'}",
                  flush=True)
        except Exception as e:
            print(f"[dma] offset {off}: FAILED {str(e)[:150]}", flush=True)
            break


def test_dynamic_roll(rng):
    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(s, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            grid_spec=grid_spec,
        )(s, x)

    x = jnp.asarray(rng.integers(0, 1 << 32, (8, 128), dtype=np.uint32))
    for s in (1, 37):
        try:
            got = np.asarray(f(jnp.asarray([s], dtype=jnp.int32), x))
            ok = (got == np.roll(np.asarray(x), s, axis=1)).all()
            print(f"[roll] dynamic lane shift {s}: "
                  f"{'OK' if ok else 'WRONG DATA'}", flush=True)
        except Exception as e:
            print(f"[roll] dynamic shift {s}: FAILED {str(e)[:150]}",
                  flush=True)
            break


if __name__ == "__main__":
    print("dev:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    test_stage_cost(rng)
