"""FASTA/FASTQ streaming chunker (host side).

Replacement for the reference's mer_overlap_sequence_parser /
whole_sequence_parser (+ cooperative_pool2): turns any mix of FASTA/FASTQ
streams into fixed-size uint8 chunks ready for the device pipeline:

- reads within a chunk are separated by a SEPARATOR byte so no mer spans two
  reads (the parser's 'N'-insertion trick, mer_overlap_sequence_parser.hpp:88);
- consecutive chunks of one stream overlap by k-1 bytes so no mer spanning a
  chunk boundary is lost (the seam carry, mer_overlap_sequence_parser.hpp:164-216);
- FASTQ quality filtering replaces low-quality bases with 'N' before
  chunking (mer_qual_iterator.hpp:74-84 semantics);
- the tail of the final chunk is padded with SEPARATOR bytes.

This pure-python version favors clarity; the C++ accelerated scanner in
native/ takes over when built (same chunk semantics).
"""

from __future__ import annotations

import io
import os
import subprocess
import sys
from typing import Iterable, Iterator

import numpy as np

__all__ = [
    "SequenceChunker",
    "open_stream",
    "iter_reads",
    "sniff_format",
    "sam_records_to_fastx",
]

SEPARATOR = ord("N")  # any non-ACGT byte breaks mers; 'N' matches reference


def open_stream(path: str):
    """Open a sequence file (plain or gzip) as a binary stream."""
    if path == "/dev/fd/0" or path == "-":
        return sys.stdin.buffer
    f = open(path, "rb")
    magic = f.peek(2)[:2] if hasattr(f, "peek") else b""
    if magic == b"\x1f\x8b":
        import gzip

        return gzip.open(f)
    return f


def sniff_format(stream) -> str:
    ch = stream.peek(1)[:1] if hasattr(stream, "peek") else b""
    if ch == b">":
        return "fasta"
    if ch == b"@":
        return "fastq"
    raise ValueError("unrecognized sequence format (expected '>' or '@')")


def iter_reads(stream, with_quals: bool = False) -> Iterator:
    """Yield sequence bytes per read ((seq, qual) if with_quals).

    Tolerates multi-line FASTA/FASTQ and DOS line endings
    (mer_overlap_sequence_parser.hpp:266-287).
    """
    first = stream.read(1)
    if not first:
        return
    if first == b">":
        header = stream.readline()
        seq_parts = []
        for line in stream:
            if line.startswith(b">"):
                seq = b"".join(seq_parts)
                yield (seq, None) if with_quals else seq
                seq_parts = []
            else:
                seq_parts.append(line.rstrip(b"\r\n"))
        seq = b"".join(seq_parts)
        yield (seq, None) if with_quals else seq
    elif first == b"@":
        while True:
            header = stream.readline()  # rest of @header line
            if not header:
                break
            seq_parts = []
            line = stream.readline()
            while line and not line.startswith(b"+"):
                seq_parts.append(line.rstrip(b"\r\n"))
                line = stream.readline()
            seq = b"".join(seq_parts)
            qual_parts = []
            qlen = 0
            while qlen < len(seq):
                line = stream.readline()
                if not line:
                    break
                part = line.rstrip(b"\r\n")
                qual_parts.append(part)
                qlen += len(part)
            qual = b"".join(qual_parts)
            if len(qual) != len(seq):
                raise ValueError("FASTQ quality length mismatch")
            yield (seq, qual) if with_quals else seq
            nxt = stream.read(1)
            if not nxt:
                break
            if nxt != b"@":
                raise ValueError("malformed FASTQ record separator")
    else:
        raise ValueError("unrecognized sequence format (expected '>' or '@')")


# BAM 4-bit nibble codes "=ACMGRSVTWYHKDBN": only A/C/G/T decode to
# bases, everything else is 'N' (sam_format.hpp:76-83 decode()).
_BAM_NIB_LUT = np.full(16, ord("N"), dtype=np.uint8)
for _i, _b in ((1, "A"), (2, "C"), (4, "G"), (8, "T")):
    _BAM_NIB_LUT[_i] = ord(_b)


def _bam_records_to_fastx(stream) -> Iterator[bytes]:
    """Parse a decompressed BAM stream (positioned after the BAM\\x01
    magic) into FASTA/FASTQ record bytes.

    BGZF is a multi-member gzip stream, so `open_stream`'s gzip layer
    already yields the uncompressed BAM byte stream — no htslib needed.
    Matches the reference's htslib consumption (sam_format.hpp:59-86 +
    mer_overlap_sequence_parser.hpp:220-253): every record's SEQ is used
    as stored, non-ACGT nibbles become N, no flag filtering. Absent
    quality (0xFF fill) yields a FASTA record; otherwise raw phred is
    re-encoded as phred+33 like `samtools view` text output.
    """
    import struct

    def take(n):
        data = stream.read(n)
        if len(data) != n:
            raise ValueError("truncated BAM file")
        return data

    (l_text,) = struct.unpack("<i", take(4))
    take(l_text)
    (n_ref,) = struct.unpack("<i", take(4))
    for _ in range(n_ref):
        (l_name,) = struct.unpack("<i", take(4))
        take(l_name + 4)  # name + l_ref

    # native window parser (chunker.cpp jf_bam_records): parse complete
    # records per 4 MB window, carry the partial tail; fall back to the
    # python per-record loop below on malformed input or no native lib
    pending = b""
    try:
        from jellyfish_tpu.native import get_lib
        lib = get_lib()
    except Exception:
        lib = None
    if lib is not None and hasattr(lib, "jf_bam_records"):
        import ctypes
        bad = False
        while True:
            block = stream.read(1 << 22)
            data = pending + block
            if not data:
                return
            consumed = ctypes.c_long(0)
            h = lib.jf_bam_records(data, len(data),
                                   ctypes.byref(consumed))
            if not h:
                bad = True
                break
            try:
                n = lib.jf_cram_out_len(h)
                if n:
                    buf = ctypes.create_string_buffer(n)
                    lib.jf_cram_out_copy(h, buf)
                    yield buf.raw
            finally:
                lib.jf_cram_out_free(h)
            pending = data[consumed.value:]
            if not block:
                if pending:
                    raise ValueError("truncated BAM record")
                return
        if not bad:
            return

    class _Prepend:
        def __init__(self, head, tail):
            self.head = head
            self.tail = tail

        def read(self, n):
            if self.head:
                part, self.head = self.head[:n], self.head[n:]
                if len(part) < n:
                    part += self.tail.read(n - len(part))
                return part
            return self.tail.read(n)

    stream = _Prepend(pending, stream)

    def take(n):  # rebound over the chained stream  # noqa: F811
        data = stream.read(n)
        if len(data) != n:
            raise ValueError("truncated BAM file")
        return data

    while True:
        head = stream.read(4)
        if len(head) == 0:
            return
        if len(head) != 4:
            raise ValueError("truncated BAM record")
        (block_size,) = struct.unpack("<i", head)
        rec = take(block_size)
        l_read_name = rec[8]
        n_cigar_op, _flag = struct.unpack_from("<HH", rec, 12)
        (l_seq,) = struct.unpack_from("<i", rec, 16)
        off = 32
        name = rec[off : off + l_read_name - 1]  # drop trailing NUL
        off += l_read_name + 4 * n_cigar_op
        if l_seq == 0:
            continue
        nbytes = (l_seq + 1) // 2
        packed = np.frombuffer(rec, dtype=np.uint8, count=nbytes, offset=off)
        off += nbytes
        nib = np.empty(2 * nbytes, dtype=np.uint8)
        nib[0::2] = packed >> 4
        nib[1::2] = packed & 0x0F
        seq = _BAM_NIB_LUT[nib[:l_seq]].tobytes()
        qual = np.frombuffer(rec, dtype=np.uint8, count=l_seq, offset=off)
        if qual[0] == 0xFF:
            yield b">" + name + b"\n" + seq + b"\n"
        else:
            q33 = (np.minimum(qual, 93) + 33).astype(np.uint8).tobytes()
            yield b"@" + name + b"\n" + seq + b"\n+\n" + q33 + b"\n"


def sam_records_to_fastx(stream, need_quals: bool = True) -> Iterator[bytes]:
    """Adapt SAM/BAM to FASTA/FASTQ record bytes (sam_format.hpp role).

    Text SAM: SEQ (col 10) / QUAL (col 11) of each alignment line become
    one record; records with SEQ '*' are skipped; QUAL '*' yields a FASTA
    record. BAM (behind open_stream's gzip layer) is parsed natively —
    see _bam_records_to_fastx. CRAM 3.x is decoded natively too
    (io/cram.py — containers, rANS, feature-coded reads); reference-
    compressed CRAMs locate their reference FASTA via JF_CRAM_REF or a
    local-file UR: header field.
    """
    first = stream.read(4)
    if first.startswith(b"BAM\x01"):
        yield from _bam_records_to_fastx(stream)
        return
    if first.startswith(b"CRAM"):
        from jellyfish_tpu.io.cram import cram_records_to_fastx

        # counting without -Q never looks at qualities: let the CRAM
        # reader skip decoding the quality blocks outright (fqz decode
        # dominates quality-heavy CRAMs)
        yield from cram_records_to_fastx(stream, need_quals=need_quals)
        return
    buf = first + stream.readline()
    while True:
        line = buf if buf is not None else stream.readline()
        buf = None
        if not line:
            return
        if line.startswith(b"@"):
            continue
        f = line.rstrip(b"\r\n").split(b"\t")
        if len(f) < 11 or f[9] == b"*":
            continue
        if f[10] == b"*":
            yield b">" + f[0] + b"\n" + f[9] + b"\n"
        else:
            yield b"@" + f[0] + b"\n" + f[9] + b"\n+\n" + f[10] + b"\n"


class _IterStream:
    """File-like read(n) view over an iterator of byte blocks."""

    def __init__(self, blocks: Iterator[bytes]):
        self._blocks = blocks
        self._pending = b""

    def read(self, n: int = -1) -> bytes:
        chunks = [self._pending]
        have = len(self._pending)
        self._pending = b""
        while n < 0 or have < n:
            try:
                b = next(self._blocks)
            except StopIteration:
                break
            chunks.append(b)
            have += len(b)
        data = b"".join(chunks)
        if 0 <= n < len(data):
            self._pending = data[n:]
            data = data[:n]
        return data

    def readline(self) -> bytes:
        out = []
        while b"\n" not in self._pending:
            try:
                self._pending += next(self._blocks)
            except StopIteration:
                data, self._pending = self._pending, b""
                return data
        i = self._pending.index(b"\n") + 1
        line, self._pending = self._pending[:i], self._pending[i:]
        return line

    def __iter__(self):
        while True:
            line = self.readline()
            if not line:
                return
            yield line

    def close(self):
        pass


class SequenceChunker:
    """Concatenate reads from many files into fixed-size device chunks."""

    def __init__(
        self,
        paths: Iterable[str],
        k: int,
        chunk_len: int,
        min_qual: int | None = None,
        generator_cmds: Iterable[str] | None = None,
        shell: str | None = None,
        sam_paths: Iterable[str] | None = None,
        nb_files: int = 1,
        nb_generators: int = 1,
    ):
        self.paths = list(paths)
        self.k = int(k)
        self.chunk_len = int(chunk_len)
        self.min_qual = min_qual
        self.generator_cmds = list(generator_cmds or [])
        self.shell = shell or os.environ.get("SHELL", "/bin/sh")
        self.sam_paths = list(sam_paths or [])
        self.nb_files = max(1, int(nb_files))
        self.nb_generators = max(1, int(nb_generators))
        self.reads = 0
        self._procs: set = set()

    def _spawn_generator(self, cmd: str):
        proc = subprocess.Popen(
            [self.shell, "-c", cmd], stdout=subprocess.PIPE,
            start_new_session=False,
        )
        self._procs.add(proc)
        return proc

    def _streams(self):
        for path in self.paths:
            yield open_stream(path), None
        for path in self.sam_paths:
            yield _IterStream(sam_records_to_fastx(
                open_stream(path), need_quals=self.min_qual is not None
            )), None
        # -G: keep nb_generators subprocesses alive at once (the reference's
        # generator_manager runs G children concurrently into fifos,
        # generator_manager.hpp:62-162); later commands pre-start while an
        # earlier stream is being consumed, overlapping generator compute
        # (pipe back-pressure bounds their memory like the fifos did)
        from collections import deque

        pending: deque = deque()
        cmds = iter(self.generator_cmds)

        def top_up():
            while len(pending) < self.nb_generators:
                cmd = next(cmds, None)
                if cmd is None:
                    return
                pending.append(self._spawn_generator(cmd))

        top_up()
        while pending:
            proc = pending.popleft()
            yield proc.stdout, proc
            top_up()

    def _finish_proc(self, proc, completed: bool) -> None:
        """Reap a generator subprocess. After normal stream exhaustion,
        wait and propagate a nonzero exit status; on abandonment
        (interrupt, downstream error, close()) terminate-then-kill so no
        children leak — the reference's SIGTERM handling kills the
        generator manager and its children (count_main.cc:209-216,
        lib/generator_manager.cc:186-215)."""
        self._procs.discard(proc)
        try:
            if completed:
                ret = proc.wait()
                if ret != 0:
                    raise RuntimeError(
                        f"generator subprocess exited with status {ret}"
                    )
                return
            if proc.poll() is None:
                proc.terminate()
                try:
                    proc.wait(timeout=5)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
        finally:
            if proc.stdout is not None:
                proc.stdout.close()

    def close(self) -> None:
        """Terminate any live generator subprocesses (idempotent)."""
        for proc in list(self._procs):
            self._finish_proc(proc, completed=False)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _read_bytes(self):
        """Yield filtered sequence bytes per read across all streams."""
        want_quals = self.min_qual is not None
        for stream, proc in self._streams():
            completed = False
            try:
                for item in iter_reads(stream, with_quals=want_quals):
                    if want_quals:
                        seq, qual = item
                        if qual is not None:
                            s = np.frombuffer(seq, dtype=np.uint8).copy()
                            q = np.frombuffer(qual, dtype=np.uint8)
                            s[q < self.min_qual] = SEPARATOR
                            seq = s.tobytes()
                    else:
                        seq = item
                    self.reads += 1
                    yield seq
                completed = True
            finally:
                if proc is not None:
                    self._finish_proc(proc, completed)
                elif stream is not sys.stdin.buffer:
                    stream.close()

    def chunks(self) -> Iterator[np.ndarray]:
        """Yield uint8 arrays of exactly chunk_len bytes.

        Uses the native C++ scanner (native/chunker.cpp) when available;
        the pure-python path below is the reference implementation and
        fallback (JF_NO_NATIVE=1 forces it)."""
        # decide the path BEFORE iterating: once a native scanner has
        # started yielding, exceptions (failing -g generator, stream I/O
        # error) must propagate — falling back mid-stream would re-parse
        # already-yielded bases and re-execute generator commands
        native = False
        try:
            from jellyfish_tpu.native import get_lib

            native = get_lib() is not None
        except Exception:
            native = False
        if native:
            n_streams = (
                len(self.paths) + len(self.sam_paths)
                + len(self.generator_cmds)
            )
            if self.nb_files > 1 and n_streams > 1:
                # concurrent parsing of independent streams (-F):
                # ctypes releases the GIL, so native scanners genuinely
                # run in parallel (stream_manager.hpp:76-145 role)
                yield from self._chunks_native_concurrent()
            else:
                yield from self._chunks_native()
        else:
            yield from self._chunks_python()

    def _chunks_native_concurrent(self) -> Iterator[np.ndarray]:
        import queue
        import threading

        from jellyfish_tpu.native import NativeChunker

        streams = list(self._streams())
        q: queue.Queue = queue.Queue(maxsize=4 * self.nb_files)
        idx_lock = threading.Lock()
        state = {"next": 0, "reads": 0, "error": None}

        def worker():
            nc = NativeChunker(self.k, self.chunk_len, self.min_qual)
            try:
                while True:
                    with idx_lock:
                        i = state["next"]
                        if i >= len(streams):
                            break
                        state["next"] = i + 1
                    stream, proc = streams[i]
                    completed = False
                    try:
                        while True:
                            data = stream.read(1 << 20)
                            if not data:
                                break
                            for c in nc.feed(data):
                                q.put(c)
                        for c in nc.end_stream():
                            q.put(c)
                        completed = True
                    finally:
                        if proc is not None:
                            self._finish_proc(proc, completed)
                        elif stream is not sys.stdin.buffer:
                            stream.close()
                for c in nc.finish():
                    q.put(c)
                with idx_lock:
                    state["reads"] += nc.reads
            except BaseException as e:  # surface worker failures to consumer
                state["error"] = e
            finally:
                q.put(None)

        n_workers = min(self.nb_files, len(streams))
        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(n_workers)
        ]
        for t in threads:
            t.start()
        done = 0
        emitted = False
        while done < n_workers:
            item = q.get()
            if item is None:
                done += 1
                continue
            emitted = True
            yield item
        for t in threads:
            t.join()
        if state["error"] is not None:
            raise state["error"]
        self.reads = state["reads"]
        if not emitted:
            yield np.full(self.chunk_len, SEPARATOR, dtype=np.uint8)

    def _chunks_native(self) -> Iterator[np.ndarray]:
        from jellyfish_tpu.native import NativeChunker

        nc = NativeChunker(self.k, self.chunk_len, self.min_qual)
        emitted = False
        for stream, proc in self._streams():
            completed = False
            try:
                while True:
                    data = stream.read(1 << 20)
                    if not data:
                        break
                    for c in nc.feed(data):
                        emitted = True
                        yield c
                for c in nc.end_stream():
                    emitted = True
                    yield c
                completed = True
            finally:
                if proc is not None:
                    self._finish_proc(proc, completed)
                elif stream is not sys.stdin.buffer:
                    stream.close()
        for c in nc.finish():
            emitted = True
            yield c
        self.reads = nc.reads
        if not emitted:
            yield np.full(self.chunk_len, SEPARATOR, dtype=np.uint8)

    def chunks_packed(self):
        """Yield (pwords [L/16] u32, validbits [L/32] u32) per chunk — the
        device pipeline's native input (see native/chunker.cpp
        jf_pack_chunk). Requires chunk_len % 32 == 0."""
        if self.chunk_len % 32:
            raise ValueError("chunk_len must be a multiple of 32 for packed")
        from jellyfish_tpu.native import pack_chunk

        for chunk in self.chunks():
            yield pack_chunk(chunk)

    def _chunks_python(self) -> Iterator[np.ndarray]:
        L = self.chunk_len
        k = self.k
        if L <= k:
            raise ValueError("chunk_len must exceed k")
        buf = np.full(L, SEPARATOR, dtype=np.uint8)
        fill = 0
        emitted_any = False
        for seq in self._read_bytes():
            pos = 0
            n = len(seq)
            if fill >= L:  # full of finished reads: no seam needed
                yield buf
                emitted_any = True
                buf = np.full(L, SEPARATOR, dtype=np.uint8)
                fill = 0
            while pos < n:
                take = min(n - pos, L - fill)
                buf[fill : fill + take] = np.frombuffer(
                    seq[pos : pos + take], dtype=np.uint8
                )
                fill += take
                pos += take
                if pos < n:
                    # chunk boundary mid-read: emit, seam-carry k-1 bytes so
                    # boundary-spanning mers are counted exactly once
                    yield buf
                    emitted_any = True
                    tail = buf[L - (k - 1) :].copy() if k > 1 else None
                    buf = np.full(L, SEPARATOR, dtype=np.uint8)
                    if k > 1:
                        buf[: k - 1] = tail
                    fill = k - 1 if k > 1 else 0
            # end of read: a separator byte breaks mers to the next read
            if fill < L:
                buf[fill] = SEPARATOR
                fill += 1
            # else: buf is exactly full of this read's end; the fresh buffer
            # created on the next iteration starts clean (no seam).
        if fill > 0 or not emitted_any:
            yield buf
