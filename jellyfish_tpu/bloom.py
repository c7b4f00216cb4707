"""Bloom filter / 2-bit bloom counter (bc + count --bc / --bf-size modes).

Reference design (bloom_common.hpp, bloom_filter.hpp, bloom_counter2.hpp):
double hashing with two random 64 x 2k GF(2) matrices (hash_pair,
mer_dna_bloom_counter.hpp:19-34); probe positions (h0 + i*h1) mod m for
i in [0, nb_hashes); sizes m = opt_m(fpr, n), nb_hashes = opt_k(fpr)
(bloom_common.hpp:61-66). The bloom counter stores a saturating {0,1,2}
cell per position, packed 5 cells per byte base-3 on disk
(bloom_counter2.hpp:40-43); the bloom filter stores 1 bit per position.

TPU-native batching: the two matrix hashes of a whole batch are ONE MXU
bit-matmul each (ops/hashing.gf2_times); the mod-m probe expansion and the
monotone saturating scatter run vectorized on host (cells are kept unpacked
uint8 in RAM, packed base-3 only at the file boundary — format on disk is
byte-identical to the reference).

Batch-exactness: cell updates are increment-only and saturate at 2, so
min(2, cell + sum(increments)) equals any sequential interleaving of the
reference's per-mer CAS inserts (bloom_counter2.hpp:56-107).
"""

from __future__ import annotations

import math

import numpy as np

from jellyfish_tpu.gf2 import GF2Matrix
from jellyfish_tpu.io.header import FileHeader
from jellyfish_tpu.ops import multiword as mw

__all__ = [
    "opt_m",
    "opt_k",
    "BloomCounter2",
    "BloomFilter",
    "load_count_filter",
    "write_bloom_counter",
    "read_bloom_counter",
]

LOG2 = 0.6931471805599453
LOG2_SQ = 0.4804530139182014

_POW3 = np.array([1, 3, 9, 27, 81], dtype=np.uint8)


def opt_m(fp: float, n: int) -> int:
    """Bits/cells for n keys at false-positive rate fp (bloom_common.hpp:61-63)."""
    return int(n) * int(round(-math.log(fp) / LOG2_SQ))


def opt_k(fp: float) -> int:
    """Number of hash probes (bloom_common.hpp:64-66)."""
    return int(round(-math.log(fp) / LOG2))


def _random_hash_pair(k: int, rng: np.random.Generator):
    """Two random 64 x 2k matrices (hash_pair<mer_dna> ctor)."""
    m1 = GF2Matrix.random(64, 2 * k, rng)
    m2 = GF2Matrix.random(64, 2 * k, rng)
    return m1, m2


class _BloomBase:
    """Shared double-hashing machinery over batches of mers."""

    def __init__(self, m: int, nb_hashes: int, k: int,
                 m1: GF2Matrix, m2: GF2Matrix, canonical: bool = False):
        self.m = int(m)
        self.nb_hashes = int(nb_hashes)
        self.k = int(k)
        self.m1 = m1
        self.m2 = m2
        self.canonical = bool(canonical)
        self._A1 = None
        self._A2 = None

    def _device_matrices(self):
        if self._A1 is None:
            import jax.numpy as jnp

            self._A1 = jnp.asarray(self.m1.bit_matrix())
            self._A2 = jnp.asarray(self.m2.bit_matrix())
        return self._A1, self._A2

    def hashes_np(self, mers_u32: np.ndarray):
        """[N, W] mers -> (h0, h1) uint64 via two MXU bit-matmuls."""
        import jax.numpy as jnp

        from jellyfish_tpu.ops.hashing import gf2_times

        A1, A2 = self._device_matrices()
        dev = jnp.asarray(np.ascontiguousarray(mers_u32, dtype=np.uint32))
        h0 = np.asarray(gf2_times(dev, A1, 2)).astype(np.uint64)
        h1 = np.asarray(gf2_times(dev, A2, 2)).astype(np.uint64)
        h0 = h0[:, 0] | (h0[:, 1] << np.uint64(32))
        h1 = h1[:, 0] | (h1[:, 1] << np.uint64(32))
        return h0, h1

    def probe_positions(self, mers_u32: np.ndarray) -> np.ndarray:
        """[nb_hashes, N] probe positions (bloom_counter2.hpp:60-66)."""
        h0, h1 = self.hashes_np(mers_u32)
        m = np.uint64(self.m)
        base = h0 % m
        inc = h1 % m
        i = np.arange(self.nb_hashes, dtype=np.uint64)[:, None]
        return ((base[None, :] + i * inc[None, :]) % m).astype(np.int64)


def _bc_insert_dev_fn():
    """Jitted device bloom-counter insert (atomic_bits_array.hpp:83-97 /
    bloom_counter2.hpp:56-107 role, re-expressed as sort + segment-sum +
    sorted scatter-add): requires m = 2^logm <= 2^32 so the probe
    arithmetic (h0 + i*h1) mod m is a pure u32 mask — no 64-bit mod on
    TPU. Exact vs the host path: low bits of the 64-bit hashes are
    identical, and saturating-at-2 accumulation commutes with batching."""
    import functools

    import jax
    import jax.numpy as jnp

    from jellyfish_tpu.ops.hashing import gf2_times

    @functools.partial(
        jax.jit, donate_argnums=(0,), static_argnames=("nb", "logm")
    )
    def f(cells, mers, weights, A1, A2, nb, logm):
        N = mers.shape[0]
        h0 = gf2_times(mers, A1, 2)[:, 0]
        h1 = gf2_times(mers, A2, 2)[:, 0]
        mask = jnp.uint32((1 << logm) - 1) if logm < 32 else ~jnp.uint32(0)
        i = jnp.arange(nb, dtype=jnp.uint32)[:, None]
        pos = ((h0[None, :] + i * h1[None, :]) & mask).reshape(-1)
        w = jnp.minimum(weights, 2).astype(jnp.uint32)
        wb = jnp.broadcast_to(w[None, :], (nb, N)).reshape(-1)
        spos, sw = jax.lax.sort([pos, wb], num_keys=1, is_stable=False)
        M = spos.shape[0]
        idx = jnp.arange(M, dtype=jnp.int32)
        is_new = (spos != jnp.roll(spos, 1)).at[0].set(True)
        # gather-free wrapped segment sums: csum is monotone (< 2^32)
        csum = jnp.cumsum(sw, dtype=jnp.uint32)
        prev = jax.lax.cummax(
            jnp.where(is_new, jnp.roll(csum, 1).at[0].set(0), 0)
        )
        seg = csum - prev
        is_last = jnp.roll(is_new, -1).at[M - 1].set(True)
        add = jnp.where(is_last, jnp.minimum(seg, 2), 0).astype(cells.dtype)
        # each position receives its add on exactly one row (zeros on the
        # rest), so cells + add <= 4: no u8 wrap before the clip
        cells = cells.at[spos].add(add, indices_are_sorted=True)
        return jnp.minimum(cells, jnp.asarray(2, dtype=cells.dtype))

    return f


class BloomCounter2(_BloomBase):
    """Saturating {0,1,>=2} counter (bloom_counter2.hpp). With
    device=True (and m a power of two <= 2^32) cells live in HBM and
    inserts run as one jitted program per batch."""

    def __init__(self, m, nb_hashes, k, m1, m2, canonical=False, cells=None,
                 device: bool = False):
        super().__init__(m, nb_hashes, k, m1, m2, canonical)
        self._cells_np = (
            cells if cells is not None else np.zeros(self.m, dtype=np.uint8)
        )
        self._cells_dev = None
        self._device = bool(
            device and self.m <= (1 << 32) and (self.m & (self.m - 1)) == 0
        )
        self._insert_fn = None

    @property
    def cells(self) -> np.ndarray:
        if self._cells_dev is not None:
            self._cells_np = np.asarray(self._cells_dev)
            self._cells_dev = None
        return self._cells_np

    @cells.setter
    def cells(self, v) -> None:
        self._cells_np = v
        self._cells_dev = None

    @classmethod
    def from_fpr(cls, fpr: float, n: int, k: int,
                 rng: np.random.Generator | None = None, canonical=False,
                 device: bool | None = None):
        rng = rng or np.random.default_rng()
        m1, m2 = _random_hash_pair(k, rng)
        m = opt_m(fpr, n)
        if device is None:
            try:
                import jax  # noqa: F401

                device = True
            except Exception:
                device = False
        if device:
            # round up to a power of two (fpr only improves; the header
            # records m, so files stay interoperable with any reader)
            p2 = 1 << max(1, (m - 1).bit_length())
            if p2 <= (1 << 32):
                m = p2
            else:
                device = False
        return cls(m, opt_k(fpr), k, m1, m2, canonical, device=device)

    def insert_counts(self, mers_u32, weights) -> None:
        """Insert each mer `weights[i]` times (saturating at 2 per cell).

        Device mode: ONE jitted program (MXU hashes -> masked probes ->
        sort -> segment-sum -> sorted scatter-add into HBM-resident
        cells); accepts device arrays directly (PAD rows with weight 0
        are harmless: they add 0). Host fallback: sort-unique over probe
        positions instead of np.bincount (bincount with weights allocates
        an m-sized float64 temp — 22 GB for a 200M-mer filter)."""
        if self._device:
            import jax.numpy as jnp

            if self._insert_fn is None:
                self._insert_fn = _bc_insert_dev_fn()
            if self._cells_dev is None:
                import jax

                self._cells_dev = jax.device_put(self._cells_np)
            A1, A2 = self._device_matrices()
            self._cells_dev = self._insert_fn(
                self._cells_dev,
                jnp.asarray(np.ascontiguousarray(mers_u32))
                if isinstance(mers_u32, np.ndarray) else mers_u32,
                jnp.asarray(weights, dtype=jnp.uint32)
                if isinstance(weights, np.ndarray) else weights,
                A1, A2,
                nb=self.nb_hashes, logm=(self.m - 1).bit_length(),
            )
            return
        mers_u32 = np.asarray(mers_u32)
        weights = np.asarray(weights)
        sel = weights > 0
        if not sel.any():
            return
        pos = self.probe_positions(mers_u32[sel])
        w = np.minimum(weights[sel], 2).astype(np.uint8)
        wb = np.broadcast_to(w, pos.shape).ravel()
        order = np.argsort(pos.ravel(), kind="stable")
        spos = pos.ravel()[order]
        sw = wb[order]
        starts = np.ones(len(spos), dtype=bool)
        starts[1:] = spos[1:] != spos[:-1]
        idx = np.flatnonzero(starts)
        upos = spos[idx]
        # per-position add, clipped at 2 (monotone saturation is exact)
        adds = np.minimum(
            np.add.reduceat(sw.astype(np.int64), idx), 2
        ).astype(np.uint8)
        np.minimum(self.cells[upos] + adds, 2, out=adds)
        self.cells[upos] = adds

    def check(self, mers_u32: np.ndarray) -> np.ndarray:
        """Min probed cell per mer: 0, 1 or 2 (bloom_counter2.hpp:109-142)."""
        if len(mers_u32) == 0:
            return np.zeros(0, dtype=np.uint8)
        pos = self.probe_positions(mers_u32)
        return self.cells[pos].min(axis=0)

    def check_int(self, mer_bits: int) -> int:
        return int(self.check(mw.from_ints([mer_bits], mw.nwords(2 * self.k)))[0])

    # -- base-3 packing (5 cells/byte, bloom_counter2.hpp:40-43) --------------

    def nb_bytes(self) -> int:
        return self.m // 5 + (1 if self.m % 5 else 0)

    def packed_bytes(self) -> np.ndarray:
        pad = (-self.m) % 5
        cells = np.concatenate([self.cells, np.zeros(pad, dtype=np.uint8)])
        return (cells.reshape(-1, 5) * _POW3).sum(axis=1, dtype=np.uint16).astype(np.uint8)

    @staticmethod
    def unpack_bytes(raw: np.ndarray, m: int) -> np.ndarray:
        cells = (raw[:, None] // _POW3[None, :]) % 3
        return cells.reshape(-1)[:m].astype(np.uint8)


class BloomFilter(_BloomBase):
    """1-bit bloom filter for count --bf-size one-pass mode
    (bloom_filter.hpp:42-75)."""

    def __init__(self, m, nb_hashes, k, m1, m2, canonical=False, bits=None):
        super().__init__(m, nb_hashes, k, m1, m2, canonical)
        self.bits = bits if bits is not None else np.zeros(self.m, dtype=bool)

    @classmethod
    def from_size(cls, m: int, fpr: float, k: int,
                  rng: np.random.Generator | None = None, canonical=False):
        rng = rng or np.random.default_rng()
        m1, m2 = _random_hash_pair(k, rng)
        return cls(m, opt_k(fpr), k, m1, m2, canonical)

    def insert_batch(self, mers_u32: np.ndarray) -> np.ndarray:
        """Set bits for a batch of distinct mers; returns whether each was
        present BEFORE the batch (the filter_bf decision,
        count_main.cc:122-130)."""
        if len(mers_u32) == 0:
            return np.zeros(0, dtype=bool)
        pos = self.probe_positions(mers_u32)
        present = self.bits[pos].all(axis=0)
        self.bits[pos.ravel()] = True
        return present


# -- bloomcounter file format (bc_main.cc:110-124, query_main.cc:99-107) ------


def write_bloom_counter(bc: BloomCounter2, path: str, cmdline=None) -> None:
    h = FileHeader()
    h.canonical = bc.canonical
    h.format = FileHeader.FORMAT_BLOOM
    h.key_len = 2 * bc.k
    h.set_matrix(bc.m1, 1)
    h.set_matrix(bc.m2, 2)
    h.size = bc.m
    h.nb_hashes = bc.nb_hashes
    h.fill_standard()
    if cmdline is not None:
        h.set_cmdline(cmdline)
    with open(path, "wb") as f:
        h.write(f)
        f.write(bc.packed_bytes().tobytes())


def read_bloom_counter(path: str) -> BloomCounter2:
    with open(path, "rb") as f:
        h = FileHeader.read(f)
        if h.format != FileHeader.FORMAT_BLOOM:
            raise ValueError(f"invalid format {h.format!r}, expected 'bloomcounter'")
        m = h.size
        raw = np.frombuffer(
            f.read(m // 5 + (1 if m % 5 else 0)), dtype=np.uint8
        )
    k = h.key_len // 2
    cells = BloomCounter2.unpack_bytes(raw, m)
    return BloomCounter2(
        m, h.nb_hashes, k, h.matrix(1), h.matrix(2), h.canonical, cells
    )


def load_count_filter(*, bc_path=None, bf_size=None, bf_fp=0.01, k=21,
                      canonical=False, rng=None):
    """Build the count-time mer filter (count_main.cc:99-131 filter chain).

    Returns f(mers_u32 [N, W], counts [N]) -> filtered counts.
    """
    if bc_path is not None:
        bc = read_bloom_counter(bc_path)
        if bc.k != k:
            raise ValueError("Invalid mer length in bloom filter")

        def filt_bc(mers, counts):
            out = np.zeros_like(counts)
            sel = counts > 0  # skip PAD entries
            out[sel] = np.where(bc.check(mers[sel]) > 1, counts[sel], 0)
            return out

        # capability tags: the sharded counter promotes taggable filters
        # to fully on-device application (no per-chunk host round trip)
        filt_bc.kind = "bc"
        filt_bc.bloom = bc
        return filt_bc

    bf = BloomFilter.from_size(bf_size, bf_fp, k, rng=rng, canonical=canonical)

    def filt_bf(mers, counts):
        out = np.zeros_like(counts)
        sel = counts > 0  # PAD entries must never touch the filter
        present = bf.insert_batch(mers[sel])
        c = counts[sel]
        # first-ever occurrence is consumed by the filter (count - 1);
        # previously-seen mers keep their full batch count.
        out[sel] = np.where(present, c, c - 1)
        return out

    filt_bf.kind = "bf"
    filt_bf.bloom = bf
    return filt_bf
