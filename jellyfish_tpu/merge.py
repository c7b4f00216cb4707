"""K-way merge of sorted databases (jellyfish/merge_files.cc equivalent).

Databases produced with the same matrix/size are all sorted by (pos, key):
binary databases merge through a STREAMING vectorized path — block rounds
of numpy lexsort + segment reduceat bounded at O(k * block) host memory,
so partials larger than RAM merge fine (the reference streams one record
at a time through a mer_heap, merge_files.cc:45-102); text databases fall
back to a record-streaming heap merge. Semantics match the reference
exactly, including SUM/MIN/MAX/JACCARD ops and the "absent => count 0"
MIN rule.
"""

from __future__ import annotations

import heapq
from enum import Enum

import numpy as np

from jellyfish_tpu.io.files import (
    DBReader,
    encode_binary_records_np,
    write_binary_records,
    write_text_records,
)
from jellyfish_tpu.io.header import FileHeader

__all__ = ["MergeOp", "merge_files", "MergeError"]


def _np_positions(key_limbs: np.ndarray, matrix, lsize: int) -> np.ndarray:
    """Vectorized hash positions: parity(key & column-mask) per output bit
    (host-side twin of ops/hashing.gf2_apply_masks)."""
    from jellyfish_tpu.ops.hashing import masks_of_matrix

    n, W = key_limbs.shape
    if matrix.is_low_identity():
        pos = key_limbs[:, 0].astype(np.uint64)
        if W > 1 and lsize > 32:
            pos |= key_limbs[:, 1].astype(np.uint64) << np.uint64(32)
        return pos & np.uint64((1 << lsize) - 1)
    masks = masks_of_matrix(matrix, W)  # [r, W]
    pos = np.zeros(n, dtype=np.uint64)
    for j in range(matrix.r):
        t = key_limbs[:, 0] & masks[j, 0]
        for w in range(1, W):
            t = t ^ (key_limbs[:, w] & masks[j, w])
        bit = (np.bitwise_count(t) & np.uint32(1)).astype(np.uint64)
        pos |= bit << np.uint64(j)
    return pos & np.uint64((1 << lsize) - 1)


class MergeError(RuntimeError):
    pass


class MergeOp(Enum):
    SUM = "sum"
    MIN = "min"
    MAX = "max"
    JACCARD = "jaccard"


def _stream(reader: DBReader, matrix, mask):
    for key, val in reader:
        pos = matrix.times(key) & mask
        yield (pos, key, val)


class _BlockStream:
    """Block reader over one sorted binary DB: keeps a bounded buffer of
    decoded (pos, key limbs, count) records."""

    def __init__(self, reader: DBReader, matrix, lsize: int, W: int,
                 block: int):
        self.reader = reader
        self.matrix = matrix
        self.lsize = lsize
        self.W = W
        self.block = block
        self.exhausted = False
        self.pos = np.zeros(0, dtype=np.uint64)
        self.limbs = np.zeros((0, W), dtype=np.uint32)
        self.counts = np.zeros(0, dtype=np.uint64)

    def refill(self) -> None:
        while not self.exhausted and len(self.counts) < self.block:
            key_bytes, counts = self.reader.read_records_np(self.block)
            if len(counts) == 0:
                self.exhausted = True
                return
            kb_w = key_bytes.shape[1]
            buf = np.zeros((len(counts), 4 * self.W), dtype=np.uint8)
            buf[:, :kb_w] = key_bytes
            limbs = buf.view("<u4").reshape(len(counts), self.W)
            pos = _np_positions(limbs, self.matrix, self.lsize)
            self.pos = np.concatenate([self.pos, pos])
            self.limbs = np.concatenate([self.limbs, limbs], axis=0)
            self.counts = np.concatenate([self.counts, counts])

    def last_tuple(self):
        """(pos, limbs) of the final buffered record, or None if empty."""
        if len(self.counts) == 0:
            return None
        return self.pos[-1], self.limbs[-1]

    def split_le(self, frontier):
        """Pop and return records with (pos, key) <= frontier (all records
        when frontier is None); buffered order is already sorted."""
        if frontier is None:
            m = len(self.counts)
        else:
            fpos, flimbs = frontier
            le = self.pos < fpos
            eq = self.pos == fpos
            for w in range(self.W - 1, -1, -1):
                le |= eq & (self.limbs[:, w] < flimbs[w])
                eq &= self.limbs[:, w] == flimbs[w]
            le |= eq
            m = int(np.count_nonzero(le))  # sorted: a prefix
        out = (self.pos[:m], self.limbs[:m], self.counts[:m])
        self.pos = self.pos[m:]
        self.limbs = self.limbs[m:]
        self.counts = self.counts[m:]
        return out


def _merge_binary_stream(readers, out_file, out_header, min_count, max_count,
                         op, k, size, out_counter_len, block: int = 1 << 20):
    """Streaming k-way merge of sorted binary DBs in O(k * block) host
    memory (replaces the reference's one-record-at-a-time mer_heap,
    merge_files.cc:45-102, with vectorized block rounds).

    Per round: every record whose (pos, key) is <= the MINIMUM of the
    streams' last buffered tuples can be emitted — no later record from
    any sorted stream can precede it, and since a key occurs at most once
    per input, every emitted segment is complete (MIN/JACCARD's
    seg_len == nb_files test stays exact)."""
    nb_files = len(readers)
    lsize = max(0, (size - 1).bit_length())
    W = (readers[0].header.key_len + 31) // 32
    streams = [
        _BlockStream(r, readers[0].matrix, lsize, W, block) for r in readers
    ]

    jaccard = {"inter": 0, "winter": 0, "union": 0, "wunion": 0}
    out = open(out_file, "wb")
    try:
        if op is not MergeOp.JACCARD:
            out_header.format = FileHeader.FORMAT_BINARY
            out_header.counter_len = out_counter_len
            out_header.write(out)

        while True:
            for s in streams:
                s.refill()
            live = [s.last_tuple() for s in streams if not s.exhausted]
            live = [t for t in live if t is not None]
            if live:
                frontier = min(
                    live, key=lambda t: (int(t[0]), tuple(int(x) for x in t[1][::-1]))
                )
            else:
                frontier = None
            parts = [s.split_le(frontier) for s in streams]
            pos = np.concatenate([p[0] for p in parts])
            limbs = np.concatenate([p[1] for p in parts], axis=0)
            counts = np.concatenate([p[2] for p in parts])
            n = len(counts)
            if n:
                order = np.lexsort(
                    tuple(limbs[:, w] for w in range(W)) + (pos,)
                )
                limbs = limbs[order]
                counts = counts[order]
                is_new = np.ones(n, dtype=bool)
                same = np.ones(n - 1, dtype=bool)
                for w in range(W):
                    same &= limbs[1:, w] == limbs[:-1, w]
                is_new[1:] = ~same
                starts = np.flatnonzero(is_new)
                seg_len = np.diff(np.concatenate([starts, [n]]))

                if op is MergeOp.JACCARD:
                    mins = np.minimum.reduceat(counts, starts)
                    maxc = np.maximum.reduceat(counts, starts)
                    minc = np.where(seg_len == nb_files, mins, 0)
                    jaccard["inter"] += int((minc > 0).sum())
                    jaccard["winter"] += int(minc.sum())
                    jaccard["union"] += int(len(starts))
                    jaccard["wunion"] += int(maxc.sum())
                else:
                    if op is MergeOp.SUM:
                        vals = np.add.reduceat(counts, starts)
                    elif op is MergeOp.MIN:
                        vals = np.where(
                            seg_len == nb_files,
                            np.minimum.reduceat(counts, starts), 0,
                        )
                    else:
                        vals = np.maximum.reduceat(counts, starts)
                    keys = limbs[starts]
                    sel = (vals >= np.uint64(min_count)) & (
                        vals <= np.uint64(max_count)
                    )
                    keys, vals = keys[sel], vals[sel]
                    for off in range(0, len(vals), block):
                        out.write(
                            encode_binary_records_np(
                                keys[off : off + block],
                                vals[off : off + block], k, out_counter_len,
                            )
                        )
            if frontier is None:
                break

        if op is MergeOp.JACCARD:
            union = max(jaccard["union"], 1)
            wunion = max(jaccard["wunion"], 1)
            out.write(
                f"Jaccard  {jaccard['inter'] / union}\n"
                f"wJaccard {jaccard['winter'] / wunion}\n".encode()
            )
    finally:
        out.close()


def merge_files(
    input_files,
    out_file: str,
    min_count: int = 0,
    max_count: int | None = None,
    op: MergeOp = MergeOp.SUM,
    out_header_extra: dict | None = None,
):
    """Merge databases; enforces header compatibility like
    merge_files.cc:140-151. For JACCARD, writes the two similarity lines
    instead of a database."""
    if max_count is None:
        max_count = (1 << 64) - 1
    readers = [DBReader(p) for p in input_files]
    try:
        h0 = readers[0].header
        key_len = h0.key_len
        size = h0.size
        fmt = h0.format
        matrix = readers[0].matrix
        out_counter_len = h0.counter_len if fmt == FileHeader.FORMAT_BINARY else 0
        for r in readers[1:]:
            h = r.header
            if h.format != fmt:
                raise MergeError(
                    f"Can't merge files with different formats ({fmt}, {h.format})"
                )
            if h.key_len != key_len:
                raise MergeError(
                    f"Can't merge hashes of different key lengths ({key_len}, {h.key_len})"
                )
            if h.max_reprobe_offset != h0.max_reprobe_offset:
                raise MergeError("Can't merge hashes with different reprobing strategies")
            if h.size != size:
                raise MergeError(
                    f"Can't merge hash with different size ({size}, {h.size})"
                )
            if r.matrix != matrix:
                raise MergeError("Can't merge hash with different hash function")
            if fmt == FileHeader.FORMAT_BINARY:
                out_counter_len = min(out_counter_len, h.counter_len)

        k = key_len // 2
        mask = size - 1
        nb_files = len(readers)

        out_header = FileHeader()
        out_header.size = size
        out_header.key_len = key_len
        out_header.set_matrix(matrix)
        out_header.max_reprobe = h0.max_reprobe
        out_header.root["reprobes"] = h0.root["reprobes"]
        out_header.val_len = h0.val_len
        out_header.canonical = h0.canonical
        out_header.fill_standard()
        if out_header_extra:
            out_header.root.update(out_header_extra)

        if fmt == FileHeader.FORMAT_BINARY:
            return _merge_binary_stream(
                readers, out_file, out_header, min_count, max_count, op,
                key_len // 2, size, out_counter_len,
            )

        merged = heapq.merge(*[_stream(r, r.matrix, mask) for r in readers])

        def groups():
            cur = None
            vals = []
            for pos, key, val in merged:
                if cur is None or key != cur:
                    if cur is not None:
                        yield cur, vals
                    cur, vals = key, [val]
                else:
                    vals.append(val)
            if cur is not None:
                yield cur, vals

        with open(out_file, "wb") as out:
            if op is MergeOp.JACCARD:
                inter = winter = union = wunion = 0
                for key, vals in groups():
                    minc = min(vals) if len(vals) == nb_files else 0
                    maxc = max(vals)
                    inter += minc > 0
                    winter += minc
                    union += 1
                    wunion += maxc
                out.write(
                    f"Jaccard  {inter / union}\nwJaccard {winter / wunion}\n".encode()
                )
                return

            out_header.format = fmt
            if fmt == FileHeader.FORMAT_BINARY:
                out_header.counter_len = out_counter_len
            out_header.write(out)

            def records():
                for key, vals in groups():
                    if op is MergeOp.SUM:
                        v = sum(vals)
                    elif op is MergeOp.MIN:
                        v = min(vals) if len(vals) == nb_files else 0
                    else:
                        v = max(vals)
                    if min_count <= v <= max_count:
                        yield key, v

            batch_keys, batch_vals = [], []

            def flush():
                if fmt == FileHeader.FORMAT_BINARY:
                    write_binary_records(out, batch_keys, batch_vals, k, out_counter_len)
                else:
                    write_text_records(out, batch_keys, batch_vals, k)
                batch_keys.clear()
                batch_vals.clear()

            for key, v in records():
                batch_keys.append(key)
                batch_vals.append(v)
                if len(batch_keys) >= 65536:
                    flush()
            flush()
    finally:
        for r in readers:
            r.close()
