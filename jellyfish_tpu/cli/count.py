"""`jellyfish count` — the main counting driver (sub_commands/count_main.cc).

Flag surface mirrors count_main_cmdline.yaggo:4-112. Differences from the
reference are where TPU semantics replace thread semantics: `-t` is accepted
but device parallelism comes from XLA; `-s` fixes the hash-order size (and
with --disk the spill threshold) instead of a CAS table allocation.
"""

from __future__ import annotations

import os
import time

import numpy as np


def add_parser(sub):
    from jellyfish_tpu.cli.common import add_common_input_flags, suffix_int

    p = sub.add_parser("count", help="Count k-mers in fasta or fastq files")
    p.add_argument("-m", "--mer-len", type=int, required=True,
                   dest="mer_len", help="Length of mer")
    p.add_argument("-s", "--size", type=suffix_int, required=True,
                   help="Initial hash size (suffixes k/M/G/T ok)")
    p.add_argument("-o", "--output", default="mer_counts.jf",
                   help="Output file (default mer_counts.jf)")
    p.add_argument("-c", "--counter-len", type=int, default=7, dest="counter_len",
                   help="Length in bits of counting field (header val_len)")
    p.add_argument("--out-counter-len", type=int, default=4,
                   help="Length in bytes of counter field in output")
    p.add_argument("-C", "--canonical", action="store_true",
                   help="Count both strands, canonical representation")
    p.add_argument("--bc", metavar="path",
                   help="Bloom counter to filter out singleton mers")
    p.add_argument("--bf-size", type=suffix_int, default=None,
                   help="Use bloom filter to count high-frequency mers")
    p.add_argument("--bf-fp", type=float, default=0.01,
                   help="False positive rate of bloom filter")
    p.add_argument("--if", dest="if_files", action="append", default=[],
                   metavar="path", help="Count only k-mers in these files")
    p.add_argument("-Q", "--min-qual-char", dest="min_qual_char",
                   help="Any base with quality below this character becomes N")
    p.add_argument("--quality-start", type=int, default=64,
                   help="ASCII for quality values")
    p.add_argument("--min-quality", type=int, default=None,
                   help="Minimum quality; a lesser-quality base becomes an N")
    p.add_argument("-p", "--reprobes", type=int, default=126,
                   help="Maximum number of reprobes (header compatibility)")
    p.add_argument("--text", action="store_true", help="Dump in text format")
    p.add_argument("--disk", action="store_true",
                   help="Spill sorted partials to disk instead of growing")
    p.add_argument("--no-merge", action="store_true",
                   help="Do not merge --disk intermediate files")
    p.add_argument("--no-unlink", action="store_true",
                   help="Do not delete intermediate files after merging")
    p.add_argument("--no-write", action="store_true",
                   help="Do not write the database")
    p.add_argument("-L", "--lower-count", type=int, default=None,
                   help="Do not output mers with count < lower-count")
    p.add_argument("-U", "--upper-count", type=int, default=None,
                   help="Do not output mers with count > upper-count")
    p.add_argument("--sam", action="append", default=[], metavar="PATH",
                   help="SAM/BAM/CRAM formatted input file")
    p.add_argument("-d", "--devices", default="1", metavar="N|auto",
                   help="Shard the hash across N chips of the mesh "
                        "('auto' = all visible devices; TPU extension)")
    p.add_argument("--coordinator", metavar="HOST:PORT",
                   help="Multi-host run: coordinator address (TPU "
                        "extension; run one process per host with "
                        "--num-processes/--process-id)")
    p.add_argument("--num-processes", type=int, dest="num_processes",
                   help="Multi-host run: total number of processes")
    p.add_argument("--process-id", type=int, dest="process_id",
                   help="Multi-host run: this process's rank [0, N)")
    p.add_argument("--packed-store", action="store_true",
                   dest="packed_store",
                   help="Bit-pack resting store runs (~3x more distinct "
                        "mers per chip HBM; TPU extension, see "
                        "'jellyfish mem --packed')")
    p.add_argument("--matrix-seed", type=int, dest="matrix_seed",
                   default=None,
                   help="Seed for the random hash matrix (TPU extension; "
                        "multi-host processes must agree — given no seed, "
                        "process 0 broadcasts one)")
    add_common_input_flags(p)
    p.add_argument("file", nargs="*", help="Sequence file(s) (fasta/fastq)")
    p.set_defaults(func=run)
    return p


def _prefetch(iterable, depth: int = 4):
    """Run `iterable` on a producer thread with a bounded queue."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    DONE = object()
    state = {"error": None}

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:
            state["error"] = e
        finally:
            q.put(DONE)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is DONE:
            break
        yield item
    t.join()
    if state["error"] is not None:
        raise state["error"]


def _device_staged(batches):
    """Double-buffered H2D staging: issue the (async) device_put of
    batch i+1 before batch i's pipeline is dispatched, so the transfer
    of the next batch rides under the current batch's compute
    (roadmap item 4 in PERF.md; counter's jnp.asarray is a no-op on
    already-device arrays)."""
    import jax

    prev = None
    for batch in batches:
        staged = (
            jax.device_put(np.stack([b[0] for b in batch])),
            jax.device_put(np.stack([b[1] for b in batch])),
        )
        if prev is not None:
            yield prev
        prev = staged
    if prev is not None:
        yield prev


def _batched(iterable, n: int):
    """Group items into lists of n, padding the tail by repeating items
    zeroed out (works for uint8 chunks and (pwords, validbits) tuples:
    zeroed validity/separator-only bytes produce no windows)."""
    batch = []
    for item in iterable:
        batch.append(item)
        if len(batch) == n:
            yield batch
            batch = []
    if batch:
        pad = batch[-1]
        if isinstance(pad, tuple):
            zero = tuple(np.zeros_like(x) for x in pad)
        else:
            zero = np.full_like(pad, ord("N"))
        batch.extend([zero] * (n - len(batch)))
        yield batch


def _load_generator_cmds(path: str):
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def _min_qual(args):
    if args.min_qual_char is not None:
        if len(args.min_qual_char) != 1:
            raise SystemExit("jellyfish count: -Q must be a single character")
        return ord(args.min_qual_char)
    if args.min_quality is not None:
        return args.quality_start + args.min_quality
    return None


def run(args, argv):
    from jellyfish_tpu.cli.common import die
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.io.parse import SequenceChunker

    t_start = time.perf_counter()
    k = args.mer_len
    if not args.file and not args.generator and not args.sam:
        die("count: no input files given")

    if args.coordinator:
        # multi-host: initialize the distributed runtime BEFORE any
        # backend use, agree on the hash matrix, and take the dedicated
        # data-parallel path (SURVEY §7 step 7). Each process counts the
        # input files IT was given; the global mesh spans all processes.
        if args.num_processes is None or args.process_id is None:
            die("count: --coordinator requires --num-processes and "
                "--process-id")
        # every flag composes with --coordinator (count_main.cc:99-131's
        # filter chain works under any parallelism): -L/-U and --text
        # apply per dump segment, --disk spills per-rank partial DBs
        # merged locally, --bc/--bf load the filter in every process and
        # apply at finalize (each mer exactly once, at its owner shard;
        # --bf multihost is the false-positive-free finalize semantics),
        # and --if runs a lockstep PRIME pass (restrict_to_multihost)
        from jellyfish_tpu.parallel.multihost import init_multihost

        init_multihost(
            args.coordinator, args.num_processes, args.process_id,
            platform=os.environ.get("JF_MH_PLATFORM") or None,
        )

    gen_cmds = _load_generator_cmds(args.generator) if args.generator else None

    filt = None
    if args.bc or args.bf_size is not None:
        from jellyfish_tpu.bloom import load_count_filter

        filt = load_count_filter(
            bc_path=args.bc, bf_size=args.bf_size, bf_fp=args.bf_fp, k=k,
            canonical=args.canonical,
        )

    if args.coordinator or args.devices == "auto":
        import jax

        n_devices = len(jax.devices())
    else:
        n_devices = int(args.devices)

    seed = args.matrix_seed
    if args.coordinator and seed is None:
        # all processes must build the SAME matrix: rank 0 draws a seed
        # and broadcasts it over the freshly-initialized runtime
        import jax
        from jax.experimental import multihost_utils as mu

        s = (np.random.default_rng().integers(0, 1 << 62)
             if jax.process_index() == 0 else 0)
        seed = int(mu.broadcast_one_to_all(np.uint64(s)))
    rng = np.random.default_rng(seed if seed is not None else None)

    if n_devices > 1:
        from jellyfish_tpu.parallel.sharded import (
            ShardedMerCounter,
            make_mesh,
        )

        import jax

        avail = len(jax.devices())
        if n_devices > avail:
            die(f"count: --devices {n_devices} exceeds the {avail} "
                "visible devices")
        counter = ShardedMerCounter(
            k, size=args.size, mesh=make_mesh(n_devices),
            canonical=args.canonical, rng=rng,
            mer_filter=filt,
            pack_resting=bool(getattr(args, "packed_store", False)),
        )
    else:
        counter = MerCounter(
            k, size=args.size, canonical=args.canonical,
            rng=rng, mer_filter=filt,
            pack_resting=bool(getattr(args, "packed_store", False)),
        )

    chunker = SequenceChunker(
        list(args.file), k, chunk_len=args.chunk_len, min_qual=_min_qual(args),
        generator_cmds=gen_cmds, shell=args.shell, sam_paths=list(args.sam),
        nb_files=args.nb_files, nb_generators=args.nb_generators,
    )

    # terminate generator children on SIGTERM/SIGINT instead of leaking
    # them (count_main.cc:209-216 kills the generator manager): convert
    # the signal to SystemExit so the finally below reaps everything
    import signal

    def _on_term(signum, frame):
        raise SystemExit(143)

    old_term = None
    try:
        old_term = signal.signal(signal.SIGTERM, _on_term)
    except ValueError:
        pass  # not the main thread (library use)

    try:
        return _run_counting(args, argv, k, counter, chunker, t_start)
    finally:
        chunker.close()
        if old_term is not None:
            signal.signal(signal.SIGTERM, old_term)


def _run_counting(args, argv, k, counter, chunker, t_start):
    from jellyfish_tpu.io.dumpers import dump_counter
    from jellyfish_tpu.io.parse import SequenceChunker
    from jellyfish_tpu.merge import merge_files

    if args.coordinator:
        return _run_counting_multihost(args, argv, k, counter, chunker,
                                       t_start)

    n_devices = counter.n_shards if hasattr(counter, "n_shards") else 1
    filt = getattr(counter, "mer_filter", None)

    if args.if_files:
        # build the restriction BEFORE counting (the reference PRIMEs the
        # table first, count_main.cc:288-295) so --disk spill dumps are
        # filtered too: every finalize applies the restrict store
        with SequenceChunker(
            list(args.if_files), k, chunk_len=args.chunk_len
        ) as allowed:
            counter.restrict_to(allowed.chunks())

    t_init = time.perf_counter()

    intermediates = []
    spill_entries = args.size if args.disk else None

    def maybe_spill():
        if spill_entries is None:
            return
        # entries currently held across LSM levels (16 bytes per slot)
        if counter.store.device_bytes() // 16 >= 2 * spill_entries:
            path = f"{args.output}{len(intermediates)}"
            dump_counter(
                counter, path, text=args.text,
                counter_len_bytes=args.out_counter_len,
                val_len_bits=args.counter_len, max_reprobe=args.reprobes,
                cmdline=argv,
            )
            counter.reset()
            intermediates.append(path)

    if filt is None and args.chunk_len % 32 == 0:
        # fast ingest: host-packed 2-bit codes + validity bitstream, with
        # parse+pack running on a producer thread so host work overlaps
        # device transfers and compute (cooperative_pool2.hpp role)
        if n_devices > 1:
            # [P, ...] batches, one chunk per shard; short tails pad with
            # all-invalid chunks (zero validity bits -> zero windows)
            for batch in _prefetch(
                _batched(chunker.chunks_packed(), n_devices)
            ):
                counter.add_chunks_packed(
                    np.stack([b[0] for b in batch]),
                    np.stack([b[1] for b in batch]),
                )
                maybe_spill()
        else:
            # batch B chunks per device dispatch (amortizes the fixed
            # dispatch latency; tail pads with all-invalid chunks)
            B = int(os.environ.get("JF_INGEST_BATCH", 8))
            for pw, vb in _device_staged(
                _prefetch(_batched(chunker.chunks_packed(), B))
            ):
                counter.add_chunks_packed_batch(pw, vb)
                maybe_spill()
    else:
        if n_devices > 1:
            for batch in _prefetch(_batched(chunker.chunks(), n_devices)):
                counter.add_chunks(np.stack(batch))
                maybe_spill()
        else:
            for chunk in chunker.chunks():
                counter.add_chunk(chunk)
                maybe_spill()

    t_count = time.perf_counter()

    if not args.no_write:
        if not intermediates:
            dump_counter(
                counter, args.output, text=args.text,
                counter_len_bytes=args.out_counter_len,
                val_len_bits=args.counter_len, max_reprobe=args.reprobes,
                lower_count=args.lower_count or 0,
                upper_count=args.upper_count, cmdline=argv,
            )
        else:
            path = f"{args.output}{len(intermediates)}"
            dump_counter(
                counter, path, text=args.text,
                counter_len_bytes=args.out_counter_len,
                val_len_bits=args.counter_len, max_reprobe=args.reprobes,
                cmdline=argv,
            )
            intermediates.append(path)
            if not args.no_merge:
                merge_files(
                    intermediates, args.output,
                    min_count=args.lower_count or 0,
                    max_count=args.upper_count,
                    out_header_extra={"cmdline": list(argv)},
                )
                if not args.no_unlink:
                    for f in intermediates:
                        os.unlink(f)

    t_write = time.perf_counter()
    if args.timing:
        with open(args.timing, "w") as f:
            f.write(f"Init     {t_init - t_start:.4f}\n")
            f.write(f"Counting {t_count - t_init:.4f}\n")
            f.write(f"Writing  {t_write - t_count:.4f}\n")
    return 0


def _run_counting_multihost(args, argv, k, counter, chunker, t_start):
    """Multi-host counting loop (SURVEY §7 step 7): every process feeds
    its LOCAL mesh rows from its own input files (data-parallel host
    ingestion); the routed exchange crosses ICI within a host and DCN
    across hosts. Because every step is a collective program, the
    processes equalize their step counts with all-invalid padding steps
    before finalizing. Dump: each process writes its contiguous segment
    of the global hash order; rank 0 concatenates (multihost.assemble_db
    — no cross-host table motion)."""
    import jax
    from jax.experimental import multihost_utils as mu

    from jellyfish_tpu.parallel.multihost import (
        assemble_db,
        write_local_segments,
    )

    t_init = time.perf_counter()
    rank = jax.process_index()

    if args.if_files:
        # PRIME pass before counting (count_main.cc:288-295), run in
        # lockstep across processes (each exchange step is a collective)
        from jellyfish_tpu.io.parse import SequenceChunker

        with SequenceChunker(
            list(args.if_files), k, chunk_len=args.chunk_len
        ) as allowed:
            counter.restrict_to_multihost(allowed.chunks(),
                                          args.chunk_len)

    prefix = args.output + ".mh"
    spill_entries = args.size if args.disk else None
    spills: list = []  # THIS rank's spill DBs (standalone, header-embedded)

    def maybe_spill():
        # deterministic across processes: device_bytes sums GLOBAL
        # shapes and every process steps in lockstep, so the trigger
        # fires on the same step everywhere (the spill finalize is a
        # collective program)
        if spill_entries is None:
            return
        if counter.store.device_bytes() // 16 >= 2 * spill_entries:
            path = f"{prefix}.spill{len(spills)}.rank{rank}.jf"
            write_local_segments(
                counter, prefix,
                counter_len_bytes=args.out_counter_len,
                val_len_bits=args.counter_len,
                max_reprobe=args.reprobes, cmdline=argv,
                text=args.text, part_path=path, embed_header=True,
            )
            counter.reset()
            spills.append(path)

    rows = counter._local_rows
    L = args.chunk_len
    # every counting step is a COLLECTIVE program (the routed all-to-all
    # spans all processes), so processes must step in LOCKSTEP even while
    # their input volumes differ: each round, a per-process has-data flag
    # is allgathered; exhausted processes feed all-invalid padding steps
    # (zero valid windows) until every process is done
    if L % 32 == 0:
        batches = _prefetch(_batched(chunker.chunks_packed(), rows))
        pad_step = (np.zeros((rows, L // 16), dtype=np.uint32),
                    np.zeros((rows, (L + 31) // 32), dtype=np.uint32))

        def add(batch):
            counter.add_chunks_packed(
                np.stack([b[0] for b in batch]),
                np.stack([b[1] for b in batch]),
            )

        add_pad = lambda: counter.add_chunks_packed(*pad_step)  # noqa: E731
    else:
        batches = _prefetch(_batched(chunker.chunks(), rows))
        pad_chunks = np.full((rows, L), ord("N"), dtype=np.uint8)
        add = lambda batch: counter.add_chunks(np.stack(batch))  # noqa: E731
        add_pad = lambda: counter.add_chunks(pad_chunks)  # noqa: E731

    it = iter(batches)
    while True:
        batch = next(it, None)
        flags = mu.process_allgather(
            np.asarray([batch is not None], dtype=np.int32)
        )
        if not flags.any():
            break
        if batch is not None:
            add(batch)
        else:
            add_pad()
        maybe_spill()

    t_count = time.perf_counter()

    if not args.no_write:
        if spills:
            # --disk: dump the final partial, then each rank k-way
            # merges ITS OWN spill DBs (all cover the same contiguous
            # shard range in the same hash order — a purely local merge,
            # no cross-host motion; -L/-U apply at the merge like the
            # single-process intermediates flow, count_main.cc:348-373)
            from jellyfish_tpu.merge import merge_files

            path = f"{prefix}.spill{len(spills)}.rank{rank}.jf"
            write_local_segments(
                counter, prefix,
                counter_len_bytes=args.out_counter_len,
                val_len_bits=args.counter_len,
                max_reprobe=args.reprobes, cmdline=argv,
                text=args.text, part_path=path, embed_header=True,
            )
            spills.append(path)
            merged = f"{prefix}.rank{rank}.jf"
            merge_files(
                spills, merged,
                min_count=args.lower_count or 0,
                max_count=args.upper_count,
                out_header_extra={"cmdline": list(argv)},
            )
            if not args.no_unlink:
                for p in spills:
                    os.unlink(p)
            mu.sync_global_devices("jellyfish-count-dump-done")
            if rank == 0:
                from jellyfish_tpu.parallel.multihost import (
                    assemble_db_full_parts,
                )

                assemble_db_full_parts(
                    [f"{prefix}.rank{r}.jf"
                     for r in range(args.num_processes)],
                    args.output,
                )
                if not args.no_unlink:
                    for r in range(args.num_processes):
                        os.unlink(f"{prefix}.rank{r}.jf")
        else:
            write_local_segments(
                counter, prefix,
                counter_len_bytes=args.out_counter_len,
                val_len_bits=args.counter_len,
                max_reprobe=args.reprobes,
                cmdline=argv,
                text=args.text,
                lower_count=args.lower_count or 0,
                upper_count=args.upper_count,
            )
            mu.sync_global_devices("jellyfish-count-dump-done")
            if rank == 0:
                assemble_db(prefix, args.num_processes, args.output)
                if not args.no_unlink:
                    os.unlink(f"{prefix}.header")
                    for r in range(args.num_processes):
                        os.unlink(f"{prefix}.part{r}")
        mu.sync_global_devices("jellyfish-count-assemble-done")

    t_write = time.perf_counter()
    if args.timing and jax.process_index() == 0:
        with open(args.timing, "w") as f:
            f.write(f"Init     {t_init - t_start:.4f}\n")
            f.write(f"Counting {t_count - t_init:.4f}\n")
            f.write(f"Writing  {t_write - t_count:.4f}\n")
    return 0
