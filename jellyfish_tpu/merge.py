"""K-way merge of sorted databases (jellyfish/merge_files.cc equivalent).

Databases produced with the same matrix/size are all sorted by (pos, key), so
a streaming heap merge reproduces the reference semantics exactly, including
SUM/MIN/MAX/JACCARD ops and the "absent => count 0" MIN rule
(merge_files.cc:45-102).
"""

from __future__ import annotations

import heapq
from enum import Enum

from jellyfish_tpu.io.files import DBReader, write_binary_records, write_text_records
from jellyfish_tpu.io.header import FileHeader

__all__ = ["MergeOp", "merge_files", "MergeError"]


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
