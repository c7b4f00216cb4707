"""Multi-host (DCN) orchestration for the sharded counter (SURVEY §7
step 7; the reference has no multi-node story at all — its parallelism
stops at pthreads, count_main.cc:152-184).

Topology: one process per host, each driving its local chips; the global
1-D `shards` mesh spans all processes, so the per-step all-to-all routes
mers to owner shards over ICI within a host and DCN across hosts, and
chip-local consolidation/merging never crosses hosts. Each host feeds its
own input slice (data-parallel ingestion) via
jax.make_array_from_process_local_data.

Dump: shard p owns one contiguous range of the global hash order, and
shards are laid out process-major, so every host writes ONE contiguous
segment file of the final database; assembling is header + byte
concatenation in rank order — no cross-host table motion at all.

Verified end-to-end on a 2-process x 4-virtual-CPU-device topology in
tests/test_multihost.py (spawns real coordinated processes with gloo
collectives).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "init_multihost",
    "write_local_segments",
    "assemble_db",
    "assemble_db_full_parts",
]


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int, platform: str | None = None) -> None:
    """Initialize the distributed runtime for a multi-host run. On CPU
    (testing) selects gloo collectives; on TPU pods the default transport
    is ICI/DCN."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _segment_header(counter, *, counter_len_bytes, val_len_bits,
                    max_reprobe, text, cmdline):
    from jellyfish_tpu.io.files import make_count_header
    from jellyfish_tpu.io.header import FileHeader

    fmt = FileHeader.FORMAT_TEXT if text else FileHeader.FORMAT_BINARY
    return make_count_header(
        k=counter.k, size=counter.size, matrix=counter.matrix,
        canonical=counter.canonical, val_len_bits=val_len_bits,
        counter_len_bytes=counter_len_bytes, max_reprobe=max_reprobe,
        fmt=fmt, cmdline=cmdline,
    )


def write_local_segments(counter, prefix: str,
                         counter_len_bytes: int = 4,
                         val_len_bits: int = 7,
                         max_reprobe: int = 126,
                         cmdline=None,
                         text: bool = False,
                         lower_count: int = 0,
                         upper_count: int | None = None,
                         part_path: str | None = None,
                         embed_header: bool = False) -> int:
    """Write THIS process's contiguous dump segment to
    `{prefix}.part{rank}` (or `part_path`); rank 0 also writes
    `{prefix}.header` — unless embed_header, where EVERY rank prepends
    the header to its own part, making it a standalone database (the
    --disk spill flow merges per-rank spill DBs locally). -L/-U filters
    are applied per segment (count filters are per-record, dumper.hpp:
    26-93); --text writes text/sorted records. Returns #records."""
    import jax

    from jellyfish_tpu.io.files import (
        encode_binary_records_np,
        mer_strings_np,
    )

    rank = jax.process_index()
    parts = counter.finalize_local_np()
    n = 0
    path = part_path if part_path is not None else f"{prefix}.part{rank}"
    hi = (np.uint64(upper_count) if upper_count is not None
          else np.iinfo(np.uint64).max)
    with open(path, "wb") as f:
        if embed_header:
            _segment_header(
                counter, counter_len_bytes=counter_len_bytes,
                val_len_bits=val_len_bits, max_reprobe=max_reprobe,
                text=text, cmdline=cmdline,
            ).write(f)
        for _, mers, counts in parts:
            if lower_count or upper_count is not None:
                sel = ((counts >= np.uint64(lower_count))
                       & (counts <= hi))
                mers, counts = mers[sel], counts[sel]
            if text:
                # flush in batches like io/files.write_text_records — a
                # single join of a multi-GB segment would double peak
                # host memory
                block = 65536
                for off in range(0, len(counts), block):
                    chars = mer_strings_np(mers[off:off + block],
                                           counter.k)
                    cs = counts[off:off + block]
                    f.write(
                        b"".join(
                            b"%s %d\n" % (chars[i].tobytes(), cs[i])
                            for i in range(len(cs))
                        )
                    )
            else:
                f.write(
                    encode_binary_records_np(
                        mers, counts, counter.k, counter_len_bytes
                    )
                )
            n += len(counts)
    if rank == 0 and not embed_header:
        header = _segment_header(
            counter, counter_len_bytes=counter_len_bytes,
            val_len_bits=val_len_bits, max_reprobe=max_reprobe,
            text=text, cmdline=cmdline,
        )
        with open(f"{prefix}.header", "wb") as f:
            header.write(f)
    return n


def assemble_db(prefix: str, num_processes: int, out_path: str) -> None:
    """Concatenate the header + per-rank segments (in rank order = global
    hash order) into one standard database file."""
    import shutil

    with open(out_path, "wb") as out:
        with open(f"{prefix}.header", "rb") as f:
            shutil.copyfileobj(f, out)
        for r in range(num_processes):
            with open(f"{prefix}.part{r}", "rb") as f:
                shutil.copyfileobj(f, out)


def assemble_db_full_parts(part_paths, out_path: str) -> None:
    """Assemble standalone per-rank DBs (each header + its shard-range
    records, rank order = global hash order) into one database: rank 0's
    file is copied whole, later ranks contribute records only (their
    headers carry identical hash parameters, dropped)."""
    import shutil

    from jellyfish_tpu.io.header import FileHeader

    with open(out_path, "wb") as out:
        for i, p in enumerate(part_paths):
            with open(p, "rb") as f:
                if i > 0:
                    # parse (and validate) the duplicate header through
                    # the one header implementation, then copy records
                    FileHeader.read(f)
                shutil.copyfileobj(f, out)
