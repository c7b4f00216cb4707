"""Round-3 probe: lax.sort cost vs operand byte budget on the real chip.

Question: is sort cost purely operand-movement-bound (PERF negative result
3), and what do narrower operand mixes buy for the two hot passes?

  consolidate (k=21): sort [u16, u32] keys            (6 B/row)
  compact     (k=21): sort [u16, u32, ~cnt u32]       (10 B/row)
  consolidate (k=33): sort [u8, u32, u32]             (9 B/row)
  compact     (k=33): sort [u8, u32, u32, ~cnt u32]   (13 B/row)

Variants probed: single-operand scalings (u8/u16/u32), count as u16,
k=33 keys as u16 limbs, batched ROWSORT (sort along the last axis of
[R, C]) as a function of C, and the full rowsort-compaction scheme at
the steady-state density.

All data is DEVICE-GENERATED (the dev rig's H2D tunnel is ~2 MB/s; a
single 2^26 u32 operand would take minutes to stage).

Run on the real chip: python experiments/sort_bytes_probe.py
Env: JF_PROBE_LOG2 (default 26), JF_PROBE_REPS (default 3),
     JF_PROBE_DENSITY (default 0.25).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


@jax.jit
def _checksum(x):
    return x.ravel()[0].astype(jnp.uint32)


def sync(out):
    np.asarray(_checksum(jax.tree.leaves(out)[0]))


def timeit(name, fn, args, reps, M):
    sync(fn(*args))  # warm (compile both fn and the checksum shape)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best*1e3/(M/1e6):7.2f} ms/M  ({best*1e3:8.1f} ms)",
          flush=True)
    return best


def devgen(M, seed=0):
    """Generate probe operands on device (one tiny jit, no H2D)."""

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 6)
        u16a = jax.random.randint(ks[0], (M,), 0, 1 << 10, jnp.int32)
        u8a = jax.random.randint(ks[1], (M,), 0, 4, jnp.int32)
        u32a = jax.random.bits(ks[2], (M,), jnp.uint32)
        u32b = jax.random.bits(ks[3], (M,), jnp.uint32)
        u32c = jax.random.bits(ks[4], (M,), jnp.uint32)
        u16c = jax.random.randint(ks[5], (M,), 0, 1 << 16, jnp.int32)
        return (u16a.astype(jnp.uint16), u8a.astype(jnp.uint8),
                u32a, u32b, u32c, u16c.astype(jnp.uint16))

    return gen(jax.random.PRNGKey(seed))


def main():
    log2 = int(os.environ.get("JF_PROBE_LOG2", 26))
    reps = int(os.environ.get("JF_PROBE_REPS", 3))
    M = 1 << log2
    u16a, u8a, u32a, u32b, u32c, u16c = devgen(M)

    def s(nk):
        return jax.jit(
            lambda *a: jax.lax.sort(list(a), num_keys=nk, is_stable=False)
        )

    print(f"rows = 2^{log2} = {M}", flush=True)
    timeit("sort [u32] (4B)", s(1), (u32a,), reps, M)
    timeit("sort [u16] (2B)", s(1), (u16a,), reps, M)
    timeit("sort [u16,u32] k21-consol (6B)", s(2), (u16a, u32a), reps, M)
    timeit("sort [u32,u32] old-consol (8B)", s(2), (u32b, u32a), reps, M)
    timeit("sort [u16,u32,u32] k21-compact (10B)", s(3),
           (u16a, u32a, u32b), reps, M)
    timeit("sort [u16,u32,u16] cnt16 (8B)", s(3), (u16a, u32a, u16c), reps, M)
    timeit("sort [u8,u32,u32] k33-consol (9B)", s(3),
           (u8a, u32a, u32b), reps, M)
    timeit("sort [u8,u32,u32,u32] k33-compact (13B)", s(4),
           (u8a, u32a, u32b, u32c), reps, M)
    timeit("sort [u8,u32,u32,u16] k33-cnt16 (11B)", s(4),
           (u8a, u32a, u32b, u16c), reps, M)
    # k33 keys as u16 limbs: 66 bits = u8 + 4xu16 vs u8+2xu32: same bytes.
    timeit("sort [u16,u16,u16,u16,u8] k33-16limb (9B)", s(5),
           (u16a, u16c, u16a, u16c, u8a), reps, M)

    # --- batched row-sort: sort along the last axis of [R, C] -----------
    # A masked consolidated run is globally sorted with PADs interspersed;
    # per-row sorts (C consecutive rows each) move the same bytes through
    # ~log2(C)^2/2 stages instead of ~log2(M)^2/2 — if sort cost is
    # stages x bytes, C=1024 should be ~7x cheaper per row than global.
    for logc in (8, 10, 12):
        C = 1 << logc
        R = M // C

        def rowsort(t, a, b, C=C, R=R):
            ops = [x.reshape(R, C) for x in (t, a, b)]
            srt = jax.lax.sort(ops, dimension=1, num_keys=3, is_stable=False)
            return [x.reshape(M) for x in srt]

        timeit(f"rowsort C=2^{logc} [u16,u32,u32] (10B)",
               jax.jit(rowsort), (u16a, u32a, u32b), reps, M)

    # --- full row-compact scheme at steady-state density ----------------
    # input: masked run (1-dens PAD). rowsort C=1024, slice D=C/2, global
    # compact sort on M/2 rows. Compare against the plain global compact.
    dens = float(os.environ.get("JF_PROBE_DENSITY", 0.25))

    @jax.jit
    def mask(t, a, c, key):
        keep = jax.random.uniform(key, (M,)) < dens
        mt = jnp.where(keep, t, jnp.uint16(0xFFFF))
        ma = jnp.where(keep, a, jnp.uint32(0xFFFFFFFF))
        mc = jnp.where(keep, c | 1, jnp.uint32(0))
        return mt, ma, mc

    mt, ma, mc = jax.block_until_ready(
        mask(u16a, u32a, u32c, jax.random.PRNGKey(7)))

    @jax.jit
    def global_compact(t, a, c):
        return jax.lax.sort([t, a, ~c], num_keys=3, is_stable=False)

    timeit(f"global compact dens={dens} (10B)", global_compact,
           (mt, ma, mc), reps, M)

    C = 1024
    R = M // C
    for div in (2, 4):
        D = C // div

        @jax.jit
        def row_compact(t, a, c, D=D):
            ops = [x.reshape(R, C) for x in (t, a, ~c)]
            srt = jax.lax.sort(ops, dimension=1, num_keys=3, is_stable=False)
            sl = [x[:, :D].reshape(R * D) for x in srt]
            # overflow: row holds > D reals iff column D is still real
            ovf = jnp.any(srt[2][:, D] != jnp.uint32(0xFFFFFFFF))
            out = jax.lax.sort(sl, num_keys=3, is_stable=False)
            return out, ovf

        timeit(f"row-compact C=1024 D=C/{div} dens={dens}",
               jax.jit(row_compact), (mt, ma, mc), reps, M)

    # two-level rowsort compact: rowsort, slice to C/2, rowsort the sliced
    # stream again (density doubled), slice to C/2 again, global on M/4
    @jax.jit
    def row_compact2(t, a, c):
        ops = [x.reshape(R, C) for x in (t, a, ~c)]
        srt = jax.lax.sort(ops, dimension=1, num_keys=3, is_stable=False)
        D = C // 2
        sl = [x[:, :D].reshape(R * D) for x in srt]
        ovf = jnp.any(srt[2][:, D] != jnp.uint32(0xFFFFFFFF))
        R2 = (R * D) // C
        ops2 = [x.reshape(R2, C) for x in sl]
        srt2 = jax.lax.sort(ops2, dimension=1, num_keys=3, is_stable=False)
        sl2 = [x[:, :D].reshape(R2 * D) for x in srt2]
        ovf |= jnp.any(srt2[2][:, D] != jnp.uint32(0xFFFFFFFF))
        out = jax.lax.sort(sl2, num_keys=3, is_stable=False)
        return out, ovf

    timeit(f"row-compact 2-level dens={dens}", row_compact2,
           (mt, ma, mc), reps, M)

    # u16-count variant of the 1-level scheme (8B instead of 10B)
    mc16 = jax.jit(lambda c: jnp.minimum(c, 0xFFFF).astype(jnp.uint16))(mc)

    @jax.jit
    def row_compact_c16(t, a, c):
        ops = [x.reshape(R, C) for x in (t, a, ~c)]
        srt = jax.lax.sort(ops, dimension=1, num_keys=3, is_stable=False)
        D = C // 2
        sl = [x[:, :D].reshape(R * D) for x in srt]
        ovf = jnp.any(srt[2][:, D] != jnp.uint16(0xFFFF))
        out = jax.lax.sort(sl, num_keys=3, is_stable=False)
        return out, ovf

    timeit(f"row-compact C=1024 cnt16 dens={dens}", row_compact_c16,
           (mt, ma, mc16), reps, M)

    # fused consolidate+compact (one jit): sort1 keys, mask, rowsort-compact
    @jax.jit
    def fused(t, lo):
        st, slo = jax.lax.sort([t, lo], num_keys=2, is_stable=False)
        neq = (st != jnp.roll(st, 1)) | (slo != jnp.roll(slo, 1))
        is_new = neq.at[0].set(True)
        idx = jnp.arange(M, dtype=jnp.int32)
        start = jax.lax.cummax(jnp.where(is_new, idx, 0))
        is_last = jnp.roll(is_new, -1).at[M - 1].set(True)
        cnt = jnp.where(is_last, (idx - start + 1).astype(jnp.uint32), 0)
        st = jnp.where(is_last, st, jnp.uint16(0xFFFF))
        slo = jnp.where(is_last, slo, jnp.uint32(0xFFFFFFFF))
        return jax.lax.sort([st, slo, ~cnt], num_keys=3, is_stable=False)

    timeit("FUSED consol+globalcompact k21", fused, (u16a, u32a), reps, M)


if __name__ == "__main__":
    main()
