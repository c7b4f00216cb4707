"""W=3 (k=33) grain probe: consolidate/compact cost per row at 2^25..2^27
rows on the real chip — does grain 2^27 fit HBM for 3-limb keys, and is
the per-row cost still flat? Informs store.consolidate_rows for W>=3."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from jellyfish_tpu.ops.count import compact_counted, consolidate_premasked

import os

KEY_BITS = int(os.environ.get("JF_PROBE_KEY_BITS", 66))  # 66 = k=33
W = (KEY_BITS + 31) // 32
LOGMS = [int(x) for x in os.environ.get("JF_PROBE_LOGMS", "25,26,27").split(",")]

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


@jax.jit
def _probe_sum(x):
    return x.ravel()[0].astype(jnp.uint32)


def sync(x):
    np.asarray(_probe_sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, *args, reps=3):
    fn(*args)
    sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        sync(o)
    return (time.perf_counter() - t0) / reps


@jax.jit
def _consol(keys):
    return consolidate_premasked(keys, KEY_BITS)


@jax.jit
def _fused(keys):
    k2, c2, n = consolidate_premasked(keys, KEY_BITS, return_n=True)
    k3, l3, _, _ = compact_counted(k2, c2, None, KEY_BITS, assume_masked=True)
    return k3, l3, n


def make_raw(M, seed):
    """Generate ON DEVICE — staging hundreds of MB through the ~2 MB/s
    dev-rig tunnel would swamp the measurement."""

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        k = jax.random.bits(k1, (M, W), dtype=jnp.uint32)
        top_bits = KEY_BITS - 32 * (W - 1)
        k = k.at[:, W - 1].set(
            k[:, W - 1] & jnp.uint32((1 << top_bits) - 1)
        )
        # ~12% PAD rows like separator windows
        pad = jax.random.uniform(k2, (M,)) < 0.12
        return jnp.where(pad[:, None], jnp.uint32(0xFFFFFFFF), k)

    out = gen(0)
    sync(out)
    return out


def main():
    print("rows        op          ms      ms/M")
    for logM in LOGMS:
        M = 1 << logM
        keys = make_raw(M, logM)
        try:
            t = timeit(_consol, keys)
            print(f"{M:>10}  consolidate {t*1e3:8.1f}  {t*1e3/(M/1e6):6.2f}")
            t = timeit(_fused, keys)
            print(f"{M:>10}  fused c+c   {t*1e3:8.1f}  {t*1e3/(M/1e6):6.2f}")
        except Exception as e:  # noqa: BLE001 — OOM report is the point
            print(f"{M:>10}  FAILED: {type(e).__name__}: {str(e)[:120]}")
        del keys


if __name__ == "__main__":
    main()
