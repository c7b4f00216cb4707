"""Native host-path extension loader.

Builds chunker.cpp with g++ on first use (no pybind11 in the image; the
C ABI is consumed via ctypes) and caches the .so next to the source.
Set JF_NO_NATIVE=1 to force the pure-python fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "chunker.cpp")
_SO = os.path.join(_DIR, "_jfnative.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except (subprocess.CalledProcessError, OSError):
        return None


def get_lib():
    """The loaded native library, or None if unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("JF_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.jf_chunker_new.restype = ctypes.c_void_p
        lib.jf_chunker_new.argtypes = [ctypes.c_int, ctypes.c_long, ctypes.c_int]
        lib.jf_chunker_free.argtypes = [ctypes.c_void_p]
        lib.jf_chunker_feed.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long
        ]
        lib.jf_chunker_end_stream.argtypes = [ctypes.c_void_p]
        lib.jf_chunker_pop.restype = ctypes.c_int
        lib.jf_chunker_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.jf_chunker_finish.restype = ctypes.c_int
        lib.jf_chunker_finish.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.jf_chunker_reads.restype = ctypes.c_ulonglong
        lib.jf_chunker_reads.argtypes = [ctypes.c_void_p]
        lib.jf_pack_chunk.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p
        ]
        if hasattr(lib, "jf_rans_decode"):
            lib.jf_rans_decode.restype = ctypes.c_long
            lib.jf_rans_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.c_void_p, ctypes.c_long,
            ]
        for fn in ("jf_rans16_decode", "jf_arith_decode", "jf_fqz_decode",
                   "jf_tok3_decode"):
            if hasattr(lib, fn):
                f = getattr(lib, fn)
                f.restype = ctypes.c_long
                f.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.c_void_p, ctypes.c_long,
                ]
        if hasattr(lib, "jf_cram_slice"):
            lib.jf_cram_slice.restype = ctypes.c_void_p
            lib.jf_cram_slice.argtypes = [
                ctypes.c_char_p, ctypes.c_long,     # raw series map
                ctypes.c_char_p, ctypes.c_long,     # raw tag map
                ctypes.c_char_p, ctypes.c_long,     # TD blob
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # RN/AP/RR
                ctypes.c_char_p,                    # substitution matrix
                ctypes.c_char_p, ctypes.c_long,     # core block
                ctypes.c_void_p, ctypes.c_void_p,   # ext ids, ptrs
                ctypes.c_void_p, ctypes.c_int,      # ext lens, count
                ctypes.c_char_p, ctypes.c_long, ctypes.c_long,  # reference
                ctypes.c_long, ctypes.c_long, ctypes.c_longlong,
                ctypes.c_int,                       # no_qual
            ]
            lib.jf_cram_out_len.restype = ctypes.c_long
            lib.jf_cram_out_len.argtypes = [ctypes.c_void_p]
            lib.jf_cram_out_copy.argtypes = [ctypes.c_void_p,
                                             ctypes.c_void_p]
            lib.jf_cram_out_free.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "jf_bam_records"):
            lib.jf_bam_records.restype = ctypes.c_void_p
            lib.jf_bam_records.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
            ]
        _lib = lib
        return _lib


_JFQUERY_SRC = os.path.join(_DIR, "jfquery.cpp")
_JFQUERY_SO = os.path.join(_DIR, "libjfquery.so")
_jfquery_lock = threading.Lock()


def build_jfquery() -> str | None:
    """Build the linkable query library (native/jfquery.cpp) if needed and
    return the .so path, or None when the toolchain is unavailable. The
    library is a standalone C-ABI artifact for external C/C++/FFI clients
    (the reference's headers-as-library query role, binary_dumper.hpp:
    112-213); jellyfish_tpu's own query path stays in io/files.py."""
    with _jfquery_lock:
        if (os.path.exists(_JFQUERY_SO)
                and os.path.getmtime(_JFQUERY_SO)
                >= os.path.getmtime(_JFQUERY_SRC)):
            return _JFQUERY_SO
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
            _JFQUERY_SRC, "-o", _JFQUERY_SO + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(_JFQUERY_SO + ".tmp", _JFQUERY_SO)
            return _JFQUERY_SO
        except (subprocess.CalledProcessError, OSError):
            return None


def pack_chunk(chunk: np.ndarray):
    """ASCII chunk [L] uint8 (L % 32 == 0) -> (pwords [L/16] u32,
    validbits [L/32] u32). Native when available, numpy fallback."""
    L = len(chunk)
    assert L % 32 == 0, "chunk length must be a multiple of 32"
    lib = get_lib()
    if lib is not None:
        pwords = np.empty(L // 16, dtype=np.uint32)
        valid = np.empty(L // 32, dtype=np.uint32)
        lib.jf_pack_chunk(
            chunk.ctypes.data_as(ctypes.c_void_p), L,
            pwords.ctypes.data_as(ctypes.c_void_p),
            valid.ctypes.data_as(ctypes.c_void_p),
        )
        return pwords, valid
    # numpy fallback (same layout)
    t = (chunk >> 1) & 3
    code = (t ^ (t >> 1)).astype(np.uint32)
    shifts = (2 * (15 - np.arange(16, dtype=np.uint32)))[None, :]
    pwords = (code.reshape(-1, 16) << shifts).sum(axis=1, dtype=np.uint32)
    lower = chunk | 0x20
    ok = (
        (lower == ord("a")) | (lower == ord("c"))
        | (lower == ord("g")) | (lower == ord("t"))
    ).astype(np.uint32)
    vshifts = np.arange(32, dtype=np.uint32)[None, :]
    valid = (ok.reshape(-1, 32) << vshifts).sum(axis=1, dtype=np.uint32)
    return pwords, valid


class NativeChunker:
    """Streaming scanner: feed file bytes, pop fixed-size chunks."""

    def __init__(self, k: int, chunk_len: int, min_qual: int | None = None):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native chunker unavailable")
        self.chunk_len = int(chunk_len)
        self.h = self.lib.jf_chunker_new(
            int(k), self.chunk_len, -1 if min_qual is None else int(min_qual)
        )
        if not self.h:
            raise MemoryError("jf_chunker_new failed")
        self._out = np.empty(self.chunk_len, dtype=np.uint8)

    def feed(self, data: bytes):
        """Feed raw bytes; yields any chunks completed by this feed."""
        self.lib.jf_chunker_feed(self.h, data, len(data))
        return self._drain()

    def _drain(self):
        out = []
        while self.lib.jf_chunker_pop(
            self.h, self._out.ctypes.data_as(ctypes.c_void_p)
        ):
            out.append(self._out.copy())
        return out

    def end_stream(self):
        self.lib.jf_chunker_end_stream(self.h)
        return self._drain()

    def finish(self):
        chunks = self._drain()
        if self.lib.jf_chunker_finish(
            self.h, self._out.ctypes.data_as(ctypes.c_void_p)
        ):
            chunks.append(self._out.copy())
        return chunks

    @property
    def reads(self) -> int:
        return int(self.lib.jf_chunker_reads(self.h))

    def __del__(self):
        if getattr(self, "h", None) and getattr(self, "lib", None):
            self.lib.jf_chunker_free(self.h)
            self.h = None
