"""Probe: cost of bitonic-merge building blocks inside a Pallas TPU kernel.

Round 1's bitonic sort used pltpu.roll for partner exchange and measured
~0.6ms/M/stage — hopeless. This probes the reshape/static-slice exchange
(sublane strides) and the transpose trick (lane strides become sublane
strides after a [128,128] transpose) to see if a stage can run near VPU
speed. Decision gate for the merge-kernel plan (PERF.md roadmap #2).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

R, C = 1024, 128  # 128K u32 elements


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, *args, reps=20):
    out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    return (time.perf_counter() - t0) / reps


def _exchange_rows(x, m):
    """Compare-exchange rows r and r+m within each 2m row block (ascending
    min/max network step). x: [R, C]."""
    y = x.reshape(R // (2 * m), 2, m, C)
    lo, hi = y[:, 0], y[:, 1]
    # Mosaic cannot legalize arith.minui on u32 vectors: compare + select
    swap = hi < lo
    mn = jnp.where(swap, hi, lo)
    mx = jnp.where(swap, lo, hi)
    return jnp.stack([mn, mx], axis=1).reshape(R, C)


def make_kernel(n_stages, transposes):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for t in range(transposes):
            # [R,128] -> 8 chunks of [128,128] transposed
            x = (
                x.reshape(R // C, C, C).transpose(0, 2, 1).reshape(R, C)
            )
        s = R // 2
        done = 0
        while done < n_stages:
            m = max(s, 1)
            x = _exchange_rows(x, m)
            s //= 2
            if s == 0:
                s = R // 2
            done += 1
        o_ref[:] = x

    return kernel


def build(n_stages, transposes=0):
    @jax.jit
    def f(x):
        return pl.pallas_call(
            make_kernel(n_stages, transposes),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return f


def main():
    print("dev:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, (R, C), dtype=np.uint32))

    t0 = timeit(build(0), x)
    print(f"passthrough: {t0*1e3:.3f}ms", flush=True)
    for n in (1, 5, 10, 20):
        t = timeit(build(n), x)
        per = (t - t0) / n
        print(
            f"{n:3d} exchange stages: {t*1e3:7.3f}ms "
            f"({per*1e6:7.1f}us/stage = {per/ (R*C/1e6)*1e3:6.3f}ms/M/stage)",
            flush=True,
        )
    for nt in (1, 2, 4):
        t = timeit(build(0, transposes=nt), x)
        per = (t - t0) / nt
        print(
            f"{nt:3d} transposes: {t*1e3:7.3f}ms ({per*1e6:7.1f}us each)",
            flush=True,
        )
    # flip along both axes (for reversing B)
    @jax.jit
    def flip(x):
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:][::-1, ::-1]
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    try:
        t = timeit(flip, x)
        print(f"flip both axes: {t*1e3:.3f}ms", flush=True)
    except Exception as e:
        print("flip failed:", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
