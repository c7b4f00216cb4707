"""Prototype: VMEM-resident bitonic full sort of one tile via Pallas.

Element index mapping is column-major over the [R, 128] VMEM tile:
i = lane * R + row. XOR-partner exchanges become sublane rolls (d < R)
or lane rolls (d >= R) plus selects — no gathers, no lane shuffles.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 1024
LANES = 128
T = R * LANES  # 131072


def _partner(x, d):
    """x[i^d] under column-major mapping."""
    if d < R:
        down = pltpu.roll(x, -d % R, axis=0)
        up = pltpu.roll(x, d, axis=0)
        riota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        return jnp.where((riota & d) == 0, down, up)
    D = d // R
    down = pltpu.roll(x, -D % LANES, axis=1)
    up = pltpu.roll(x, D, axis=1)
    liota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return jnp.where((liota & D) == 0, down, up)


def _iota_global():
    riota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return liota * R + riota


def sort_kernel(x_ref, o_ref):
    x = x_ref[:]
    gi = _iota_global()
    size = 1
    while size < T:
        d = size
        while d >= 1:
            p = _partner(x, d)
            lowe = (gi & d) == 0
            asc = (gi & (size << 1)) == 0
            # Mosaic lacks arith.minui: select on an unsigned compare
            x_le = x <= p
            mn = jnp.where(x_le, x, p)
            mx = jnp.where(x_le, p, x)
            x = jnp.where(lowe == asc, mn, mx)
            d //= 2
        size <<= 1
    o_ref[:] = x


@jax.jit
def pallas_sort(x):
    return pl.pallas_call(
        sort_kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def main():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**32, size=T, dtype=np.uint32)
    x = jnp.asarray(vals.reshape(LANES, R).T)  # column-major layout

    t0 = time.perf_counter()
    out = pallas_sort(x)
    out_np = np.asarray(out)
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    got = out_np.T.reshape(-1)  # column-major readout
    expect = np.sort(vals)
    ok = np.array_equal(got, expect)
    print("CORRECT:", ok)
    if not ok:
        bad = np.nonzero(got != expect)[0][:5]
        print("first mismatches at", bad, got[bad], expect[bad])
        return

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pallas_sort(x)
    _ = np.asarray(out[:1, :1])
    dt = (time.perf_counter() - t0) / iters
    print(f"pallas sort {T} u32: {dt*1e3:.2f} ms -> {T/dt/1e6:.0f} M elem/s")

    ls = jax.jit(lambda a: jax.lax.sort([a], num_keys=1, is_stable=False))
    flat = jnp.asarray(vals)
    r = ls(flat); _ = np.asarray(r[0][:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = ls(flat)
    _ = np.asarray(r[0][:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"lax.sort    {T} u32: {dt*1e3:.2f} ms -> {T/dt/1e6:.0f} M elem/s")


if __name__ == "__main__":
    main()
