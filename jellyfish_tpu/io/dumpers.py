"""High-level database dumping (sorted_dumper/binary_dumper/text_dumper roles).

The reference reconstructs hash order from a reprobe-scrambled table with a
per-region min-heap and token-ring ordered writes (sorted_dumper.hpp:57-101);
here the finalized store is already in hash order, so dumping is a linear
write of (recovered key, count) records with optional L/U count filters.
"""

from __future__ import annotations

import numpy as np

from jellyfish_tpu.io.files import (
    make_count_header,
    write_binary_records,
    write_text_records,
)
from jellyfish_tpu.io.header import FileHeader

__all__ = ["dump_counter"]


def dump_counter(
    counter,
    path: str,
    *,
    text: bool = False,
    counter_len_bytes: int = 4,
    val_len_bits: int = 7,
    max_reprobe: int = 126,
    lower_count: int = 0,
    upper_count: int | None = None,
    cmdline=None,
    header_extra: dict | None = None,
) -> int:
    """Finalize `counter` and write a jellyfish database. Returns #records."""
    mers, counts = counter.finalize()
    if lower_count or upper_count is not None:
        hi = np.uint64(upper_count) if upper_count is not None else np.iinfo(np.uint64).max
        sel = (counts >= np.uint64(lower_count)) & (counts <= hi)
        mers, counts = mers[sel], counts[sel]

    fmt = FileHeader.FORMAT_TEXT if text else FileHeader.FORMAT_BINARY
    header = make_count_header(
        k=counter.k,
        size=counter.size,
        matrix=counter.matrix,
        canonical=counter.canonical,
        val_len_bits=val_len_bits,
        max_reprobe=max_reprobe,
        fmt=fmt,
        counter_len_bytes=counter_len_bytes,
        cmdline=cmdline,
    )
    if header_extra:
        header.root.update(header_extra)
    with open(path, "wb") as f:
        header.write(f)
        if text:
            write_text_records(f, mers, counts, counter.k)
        else:
            write_binary_records(f, mers, counts, counter.k, counter_len_bytes)
    return len(mers)
