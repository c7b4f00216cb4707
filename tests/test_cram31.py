"""CRAM 3.1 codec tests (io/rans16.py, io/arith.py, io/tok3.py,
io/fqzcomp.py) and whole-file CRAM 3.1 reads.

Validation strategy mirrors the 3.0 suite (tests/test_cram.py): the
image has no htslib/samtools/pysam, so decoders are exercised against
this repo's independent spec-written encoders, golden byte vectors
pinning the serialized formats, mutation fuzz for robustness, and
whole-file reads through `cram_records_to_fastx`.  Confidence note:
the 3.1 codec formats (hts-specs CRAMcodecs) were implemented from
the spec without a second implementation to cross-check in this image;
the container/block framing is shared with the 3.0 path, which IS
cross-validated against the reference's consumption surface
(`sam_format.hpp:22-57`).
"""

import io
import random
import struct

import pytest

import cram_writer as cw
from cram_writer import simple_cram, fqz_method, ByteArrayStop
from jellyfish_tpu.io import arith, fqzcomp, rans16, tok3
from jellyfish_tpu.io.cram import cram_records_to_fastx
from jellyfish_tpu.io.rans16 import _Cur, write_uint7


def decode_cram(blob: bytes) -> bytes:
    stream = io.BytesIO(blob)
    assert stream.read(4) == b"CRAM"
    return b"".join(cram_records_to_fastx(stream))


def fastq(name, seq, qual):
    return (b"@" + name + b"\n" + seq + b"\n+\n"
            + bytes(min(q, 93) + 33 for q in qual) + b"\n")


def _corpus(rng):
    return [
        b"",
        b"A",
        b"ACGT" * 300,
        bytes([7]) * 999,
        bytes(range(256)),
        bytes(rng.choices(b"ACGTN", weights=[9, 8, 7, 2, 1], k=20000)),
        bytes(rng.choices(b"!#%+5?I", k=5000)),
        bytes(rng.randrange(256) for _ in range(4097)),
    ]


# ------------------------------------------------------------ uint7


def test_uint7_roundtrip_and_golden():
    for v, want in [(0, b"\x00"), (127, b"\x7f"), (128, b"\x81\x00"),
                    (16383, b"\xff\x7f"), (16384, b"\x81\x80\x00"),
                    (1 << 28, b"\x81\x80\x80\x80\x00")]:
        out = bytearray()
        write_uint7(out, v)
        assert bytes(out) == want, v
        assert _Cur(bytes(out)).uint7() == v


# ------------------------------------------------------- rANS Nx16


RANS16_FLAGSETS = [
    0, rans16.F_ORDER1, rans16.F_N32, rans16.F_ORDER1 | rans16.F_N32,
    rans16.F_CAT, rans16.F_RLE, rans16.F_PACK,
    rans16.F_PACK | rans16.F_RLE,
    rans16.F_PACK | rans16.F_RLE | rans16.F_ORDER1,
    rans16.F_STRIPE, rans16.F_NOSZ, rans16.F_ORDER1 | rans16.F_NOSZ,
]


def test_rans16_roundtrip_matrix():
    rng = random.Random(1234)
    for raw in _corpus(rng):
        for flags in RANS16_FLAGSETS:
            try:
                blob = rans16.encode(raw, flags)
            except ValueError:
                continue  # unsatisfiable (PACK>16 syms, tiny ORDER1)
            assert rans16.decode(blob, len(raw)) == raw, (len(raw), flags)


def test_rans16_compresses():
    rng = random.Random(77)
    raw = bytes(rng.choices(b"ACGT", k=65536))
    assert len(rans16.encode(raw, 0)) < len(raw) // 3


def test_rans16_golden_order0():
    # 12 'A's, alphabet {65}: freq table b"A\x00" + uint7(4096) =
    # 41 00 a0 00; all-one-symbol keeps the 4 states at 2^15 and emits
    # no stream bytes.
    blob = rans16.encode(b"A" * 12, 0)
    assert blob == (b"\x00\x0c"            # flags, uint7 len
                    b"\x41\x00\xa0\x00"    # alphabet + freq 4096
                    + struct.pack("<4I", 1 << 15, 1 << 15, 1 << 15,
                                  1 << 15))
    assert rans16.decode(blob, 12) == b"A" * 12


def test_rans16_golden_pack_meta():
    # PACK of 8 bytes over alphabet {A,C}: 1 bit/symbol, low bit first.
    blob = rans16.encode(b"ACCAACCA", rans16.F_PACK | rans16.F_CAT)
    # flags, len=8, nsym=2, map A,C, packed len=1, then CAT payload:
    # bits 0,1,1,0,0,1,1,0 low-first = 0b01100110 = 0x66
    assert blob == b"\xa0\x08\x02\x41\x43\x01\x66"
    assert rans16.decode(blob, 8) == b"ACCAACCA"


def test_rans16_native_matches_python():
    """native/chunker.cpp jf_rans16_decode == the pure-python
    reference implementation across the flag matrix (same convention
    as tests/test_native.py: python is authoritative)."""
    from jellyfish_tpu.native import get_lib
    if get_lib() is None or not hasattr(get_lib(), "jf_rans16_decode"):
        pytest.skip("native library unavailable")
    import ctypes
    lib = get_lib()
    rng = random.Random(888)
    for raw in _corpus(rng):
        for flags in RANS16_FLAGSETS:
            try:
                blob = rans16.encode(raw, flags)
            except ValueError:
                continue
            buf = ctypes.create_string_buffer(max(1, len(raw)))
            n = lib.jf_rans16_decode(blob, len(blob), buf, len(raw))
            assert n == len(raw), (len(raw), flags)
            assert buf.raw[:len(raw)] == raw, (len(raw), flags)


def test_adversarial_blocks_rejected():
    """Crafted blocks that previously crashed or were silently
    accepted: deep STRIPE nesting (C stack overflow), a PACK length
    bomb (std::bad_alloc across the C ABI), and STRIPE with zero
    lanes (silent zero-fill)."""
    # ~200k nested STRIPE|NOSZ layers: flags 0x18, N=1, uint7 clen.
    # Built outside-in from arithmetic layer sizes (an O(n) join; the
    # naive front-prepend construction is O(n^2))
    size = 4
    sizes = [size]
    for _ in range(200_000):
        hdr = bytearray([0x18, 1])
        write_uint7(hdr, size)
        size += len(hdr)
        sizes.append(size)
    headers = []
    for s in sizes[:-1][::-1]:
        hdr = bytearray([0x18, 1])
        write_uint7(hdr, s)
        headers.append(bytes(hdr))
    deep = b"".join(headers) + b"\x00" * 4
    for mod in ("rans16", "arith"):
        codec = rans16 if mod == "rans16" else arith
        with pytest.raises((ValueError, RecursionError)):
            codec.decode(deep, 4)

    # PACK|NOSZ with plen = 2^39
    bomb = bytearray([0x90, 0x01, 0x41])
    write_uint7(bomb, 1 << 39)
    for codec in (rans16, arith):
        with pytest.raises((ValueError, IndexError)):
            codec.decode(bytes(bomb), 64)

    # STRIPE with N=0 must raise, not return zero-fill
    for codec in (rans16, arith):
        with pytest.raises(ValueError, match="zero lanes"):
            codec.decode(bytes([0x08, 10, 0]), 10)

    # the native entry points reject the same inputs without crashing
    from jellyfish_tpu.native import get_lib
    lib = get_lib()
    if lib is not None and hasattr(lib, "jf_rans16_decode"):
        import ctypes
        buf = ctypes.create_string_buffer(64)
        assert lib.jf_rans16_decode(deep, len(deep), buf, 4) == -1
        assert lib.jf_arith_decode(deep, len(deep), buf, 4) == -1
        assert lib.jf_rans16_decode(bytes(bomb), len(bomb), buf, 64) == -1
        assert lib.jf_arith_decode(bytes(bomb), len(bomb), buf, 64) == -1


def test_rans16_mutation_fuzz():
    rng = random.Random(99)
    raw = bytes(rng.choices(b"ACGTN", k=3000))
    for flags in (0, rans16.F_ORDER1, rans16.F_PACK | rans16.F_RLE):
        blob = bytearray(rans16.encode(raw, flags))
        for _ in range(150):
            mut = bytearray(blob)
            op = rng.randrange(3)
            if op == 0:
                mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            elif op == 1:
                del mut[rng.randrange(len(mut)):]
            else:
                mut += bytes([rng.randrange(256)])
            try:
                out = rans16.decode(bytes(mut), len(raw))
                assert len(out) == len(raw)
            except (ValueError, IndexError, struct.error, KeyError):
                pass  # rejected cleanly — never hangs or crashes


# ------------------------------------------------- adaptive arithmetic


ARITH_FLAGSETS = [
    0, arith.F_ORDER1, arith.F_RLE, arith.F_ORDER1 | arith.F_RLE,
    arith.F_CAT, arith.F_EXT, arith.F_PACK,
    arith.F_PACK | arith.F_ORDER1 | arith.F_RLE,
    arith.F_STRIPE, arith.F_NOSZ,
]


def test_arith_roundtrip_matrix():
    rng = random.Random(4321)
    for raw in _corpus(rng):
        if len(raw) > 6000:
            raw = raw[:6000]  # adaptive coder is O(n*nsym) in python
        for flags in ARITH_FLAGSETS:
            try:
                blob = arith.encode(raw, flags)
            except ValueError:
                continue
            assert arith.decode(blob, len(raw)) == raw, (len(raw), flags)


def test_arith_compresses():
    rng = random.Random(7)
    raw = bytes(rng.choices(b"ACGT", k=20000))
    assert len(arith.encode(raw, arith.F_ORDER1)) < len(raw) // 3


def test_arith_range_coder_boundary():
    # drive the coder through many renormalisations with a skewed
    # adaptive model; exercises the 2^32-straddle truncation path
    rng = random.Random(0)
    raw = bytes(rng.choices(bytes([0, 255]), weights=[999, 1], k=30000))
    blob = arith.encode(raw, 0)
    assert arith.decode(blob, len(raw)) == raw


def test_arith_native_matches_python():
    """native/chunker.cpp jf_arith_decode == the pure-python reference
    implementation (python stays authoritative; EXT falls back)."""
    from jellyfish_tpu.native import get_lib
    if get_lib() is None or not hasattr(get_lib(), "jf_arith_decode"):
        pytest.skip("native library unavailable")
    import ctypes
    lib = get_lib()
    rng = random.Random(777)
    for raw in _corpus(rng):
        if len(raw) > 6000:
            raw = raw[:6000]
        for flags in ARITH_FLAGSETS:
            try:
                blob = arith.encode(raw, flags)
            except ValueError:
                continue
            buf = ctypes.create_string_buffer(max(1, len(raw)))
            n = lib.jf_arith_decode(blob, len(blob), buf, len(raw))
            if flags & arith.F_EXT and len(raw):
                assert n == -1  # bzip2 payloads stay on the python path
                continue
            assert n == len(raw), (len(raw), flags)
            assert buf.raw[:len(raw)] == raw, (len(raw), flags)


def test_arith_mutation_fuzz():
    rng = random.Random(199)
    raw = bytes(rng.choices(b"!#%+5?I", k=2000))
    for flags in (0, arith.F_ORDER1 | arith.F_RLE):
        blob = bytearray(arith.encode(raw, flags))
        for _ in range(100):
            mut = bytearray(blob)
            op = rng.randrange(3)
            if op == 0:
                mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            elif op == 1:
                del mut[rng.randrange(len(mut)):]
            else:
                mut += bytes([rng.randrange(256)])
            try:
                out = arith.decode(bytes(mut), len(raw))
                assert len(out) == len(raw)
            except (ValueError, IndexError, struct.error, KeyError,
                    ZeroDivisionError, OSError, EOFError):
                pass


# ------------------------------------------------------ name tokenizer


def _names_blob(names):
    return b"".join(n + b"\x00" for n in names)


def test_tok3_roundtrip():
    rng = random.Random(5)
    cases = [
        [b"SRR1234.%d HWI-ST100:7:1101:%d:%d/1" % (i, 1000 + i, 2000 + 3 * i)
         for i in range(400)],
        [b"read%06d" % i for i in range(200)],
        [b"same"] * 40,
        [b""],
        [b"m64011_190830_220126/%d/ccs" % (i * 7) for i in range(100)],
        [bytes(rng.choices(b"AZaz09:/_-#", k=rng.randrange(1, 40)))
         for _ in range(150)],
        [],
    ]
    for use_arith in (False, True):
        for names in cases:
            raw = _names_blob(names)
            blob = tok3.encode(raw, use_arith)
            assert tok3.decode(blob, len(raw)) == raw


def test_tok3_compresses_structured_names():
    names = [b"SRR0001.%d length=100" % i for i in range(1000)]
    raw = _names_blob(names)
    assert len(tok3.encode(raw, False)) < len(raw) // 10


def test_tok3_header_golden():
    raw = _names_blob([b"r1", b"r2"])
    blob = tok3.encode(raw, False)
    ulen, nnames = struct.unpack_from("<II", blob, 0)
    assert (ulen, nnames, blob[8]) == (len(raw), 2, 0)
    # first stream starts position 0 (0x80 bit) and is the TYPE stream
    assert blob[9] & 0x80 and blob[9] & 0x3F == tok3.T_TYPE


def test_tok3_native_matches_python():
    """native/chunker.cpp jf_tok3_decode == the pure-python reference
    implementation (both entropy-coder modes)."""
    from jellyfish_tpu.native import get_lib
    if get_lib() is None or not hasattr(get_lib(), "jf_tok3_decode"):
        pytest.skip("native library unavailable")
    import ctypes
    lib = get_lib()
    rng = random.Random(444)
    cases = [
        [b"SRR1.%d HWI:7:1101:%d:%d/1" % (i, 1000 + i, 3 * i)
         for i in range(300)],
        [b"q%04d" % i for i in range(150)],
        [b"same"] * 30, [b""], [],
        [bytes(rng.choices(b"AZ09:/_-", k=rng.randrange(1, 30)))
         for _ in range(100)],
    ]
    for use_arith in (False, True):
        for names in cases:
            raw = _names_blob(names)
            blob = tok3.encode(raw, use_arith)
            buf = ctypes.create_string_buffer(max(1, len(raw)))
            n = lib.jf_tok3_decode(blob, len(blob), buf, len(raw))
            assert n == len(raw)
            assert buf.raw[:len(raw)] == raw


def test_tok3_mutation_fuzz():
    rng = random.Random(23)
    raw = _names_blob([b"q%04d/x" % i for i in range(120)])
    blob = bytearray(tok3.encode(raw, False))
    for _ in range(150):
        mut = bytearray(blob)
        op = rng.randrange(3)
        if op == 0:
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        elif op == 1:
            del mut[rng.randrange(len(mut)):]
        else:
            mut += bytes([rng.randrange(256)])
        try:
            out = tok3.decode(bytes(mut), len(raw))
            assert len(out) == len(raw)
        except (ValueError, IndexError, struct.error, KeyError,
                ZeroDivisionError, OverflowError, MemoryError):
            pass


# ------------------------------------------------------------ fqzcomp


def _mkquals(rng, nrec, lo=30, hi=41, ln=(60, 100)):
    lens, parts = [], []
    for _ in range(nrec):
        n = rng.randrange(*ln)
        lens.append(n)
        cur = rng.randrange(lo, hi)
        s = bytearray()
        for _ in range(n):
            cur = min(hi - 1, max(lo, cur + rng.choice([-1, 0, 0, 1])))
            s.append(cur + 33)
        parts.append(bytes(s))
    return lens, b"".join(parts)


def test_fqz_roundtrip_paramspace():
    rng = random.Random(55)
    lens, quals = _mkquals(rng, 50)
    P = fqzcomp
    cases = [
        dict(),
        dict(pflags=P.P_DO_LEN | P.P_HAVE_QMAP),
        dict(pflags=(P.P_DO_LEN | P.P_HAVE_QMAP | P.P_HAVE_PTAB
                     | P.P_HAVE_DTAB | P.P_HAVE_QTAB)),
        dict(nparam=3),
        dict(do_rev=[i % 3 == 0 for i in range(50)]),
        dict(pflags=P.P_DO_LEN | P.P_DO_DEDUP),
    ]
    for kw in cases:
        blob = P.encode(lens, quals, **kw)
        assert P.decode(blob, len(quals)) == quals, kw


def test_fqz_fixed_len_and_dedup():
    rng = random.Random(56)
    _, quals = _mkquals(rng, 1, ln=(3000, 3001))
    lens = [100] * 30
    blob = fqzcomp.encode(lens, quals, pflags=0)
    assert fqzcomp.decode(blob, len(quals)) == quals
    q3 = bytes([73]) * 50 * 10
    blob = fqzcomp.encode([50] * 10, q3,
                          pflags=fqzcomp.P_DO_LEN | fqzcomp.P_DO_DEDUP)
    assert fqzcomp.decode(blob, len(q3)) == q3


def test_fqz_compresses_correlated_quals():
    rng = random.Random(57)
    lens, quals = _mkquals(rng, 80)
    blob = fqzcomp.encode(lens, quals)
    assert len(blob) < len(quals) // 2


def test_fqz_header_golden():
    blob = fqzcomp.encode([4], b"IIII")
    assert blob[0] == 5 and blob[1] == 0  # vers, gflags single-param


def test_fqz_native_matches_python():
    """native/chunker.cpp jf_fqz_decode == the pure-python reference
    implementation across the parameter space."""
    from jellyfish_tpu.native import get_lib
    if get_lib() is None or not hasattr(get_lib(), "jf_fqz_decode"):
        pytest.skip("native library unavailable")
    import ctypes
    lib = get_lib()
    rng = random.Random(666)
    lens, quals = _mkquals(rng, 40)
    P = fqzcomp
    cases = [
        dict(),
        dict(pflags=P.P_DO_LEN | P.P_HAVE_QMAP),
        dict(pflags=(P.P_DO_LEN | P.P_HAVE_QMAP | P.P_HAVE_PTAB
                     | P.P_HAVE_DTAB | P.P_HAVE_QTAB)),
        dict(nparam=3),
        dict(do_rev=[i % 3 == 0 for i in range(40)]),
        dict(pflags=P.P_DO_LEN | P.P_DO_DEDUP),
    ]
    for kw in cases:
        blob = P.encode(lens, quals, **kw)
        buf = ctypes.create_string_buffer(len(quals))
        n = lib.jf_fqz_decode(blob, len(blob), buf, len(quals))
        assert n == len(quals), kw
        assert buf.raw == quals, kw


def test_fqz_mutation_fuzz():
    rng = random.Random(58)
    lens, quals = _mkquals(rng, 20)
    blob = bytearray(fqzcomp.encode(lens, quals))
    for _ in range(100):
        mut = bytearray(blob)
        op = rng.randrange(3)
        if op == 0:
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        elif op == 1:
            del mut[rng.randrange(len(mut)):]
        else:
            mut += bytes([rng.randrange(256)])
        try:
            out = fqzcomp.decode(bytes(mut), len(quals))
            assert len(out) == len(quals)
        except (ValueError, IndexError, struct.error, KeyError,
                ZeroDivisionError, OverflowError, MemoryError):
            pass


def test_native_python_differential_fuzz():
    """Randomized content x flags: the native decoders and the python
    reference must produce IDENTICAL bytes (silent divergence between
    the two implementations is the failure class round-trip tests
    cannot see)."""
    from jellyfish_tpu.native import get_lib
    lib = get_lib()
    if lib is None or not hasattr(lib, "jf_tok3_decode"):
        pytest.skip("native library unavailable")
    import ctypes

    def native(fn, blob, out_len):
        buf = ctypes.create_string_buffer(max(1, out_len))
        n = getattr(lib, fn)(blob, len(blob), buf, out_len)
        return buf.raw[:out_len] if n == out_len else None

    rng = random.Random(31337)
    alphabets = [b"ACGT", b"ACGTN", bytes(range(256)), b"!#%+5?I", b"\x00\x01"]
    for trial in range(120):
        alpha = rng.choice(alphabets)
        n = rng.choice([0, 1, 7, 255, 256, 1000, 4097])
        raw = bytes(rng.choices(alpha, k=n))
        r_flags = rng.choice(RANS16_FLAGSETS)
        try:
            blob = rans16.encode(raw, r_flags)
        except ValueError:
            blob = None
        if blob is not None:
            got = native("jf_rans16_decode", blob, len(raw))
            assert got == raw, ("rans16", trial, r_flags)
        a_flags = rng.choice(ARITH_FLAGSETS)
        try:
            blob = arith.encode(raw, a_flags)
        except ValueError:
            blob = None
        if blob is not None and not (a_flags & arith.F_EXT):
            got = native("jf_arith_decode", blob, len(raw))
            assert got == raw, ("arith", trial, a_flags)
    # fqz + tok3 over randomized record/name shapes
    for trial in range(25):
        nrec = rng.randrange(1, 30)
        lens = [rng.randrange(1, 200) for _ in range(nrec)]
        lo = rng.randrange(33, 60)
        span = rng.randrange(1, 40)
        quals = bytes(rng.randrange(lo, lo + span)
                      for _ in range(sum(lens)))
        kw = rng.choice([
            dict(),
            dict(pflags=fqzcomp.P_DO_LEN | fqzcomp.P_HAVE_QMAP),
            dict(nparam=rng.randrange(2, 5)),
            dict(do_rev=[rng.random() < 0.5 for _ in range(nrec)]),
        ])
        blob = fqzcomp.encode(lens, quals, **kw)
        assert native("jf_fqz_decode", blob, len(quals)) == quals, \
            ("fqz", trial, kw)
        names = [bytes(rng.choices(b"RSTuv0123456789._:/",
                                   k=rng.randrange(1, 25)))
                 for _ in range(rng.randrange(1, 40))]
        raw = _names_blob(names)
        blob = tok3.encode(raw, rng.random() < 0.5)
        assert native("jf_tok3_decode", blob, len(raw)) == raw, \
            ("tok3", trial)


# --------------------------------------------------- whole-file CRAM 3.1


def _records(rng, n=24):
    recs = []
    for i in range(n):
        seq = bytes(rng.choices(b"ACGT", k=rng.randrange(40, 90)))
        qual = bytes(min(93, max(0, 38 + rng.randrange(-5, 3)))
                     for _ in seq)
        recs.append({"name": b"read%05d.%d" % (i, i * 3), "seq": seq,
                     "qual": qual})
    return recs


def _expected(recs):
    return b"".join(fastq(r["name"], r["seq"], r["qual"]) for r in recs)


def test_cram31_all_new_methods_end_to_end():
    """A CRAM 3.1 file whose blocks use every new method: sequences
    rANS Nx16 order-1, qualities fqzcomp, names tok3, the rest of the
    series arithmetic-coded."""
    rng = random.Random(314)
    recs = _records(rng)
    series = cw.default_series()
    series["RN"] = ByteArrayStop(0, 6)
    methods = {cid: "arith" for cid in range(1, 8)}
    methods[6] = "tok3"               # RN: NUL-separated names
    methods[8] = "rans16-o1"          # BA: sequence bases
    methods[9] = fqz_method([len(r["qual"]) for r in recs])  # QS
    methods["slice_header"] = "rans16"
    blob = simple_cram(recs, series=series, block_methods=methods,
                       version=(3, 1))
    assert decode_cram(blob) == _expected(recs)


@pytest.mark.parametrize("method", [
    "rans16", "rans16-o1", "rans16-x32", "rans16-o1x32", "rans16-cat",
    "rans16-rle", "rans16-pack", "rans16-packrle", "rans16-stripe",
    "arith", "arith-o1", "arith-rle", "arith-o1rle", "arith-pack",
    "arith-ext", "arith-cat", "arith-stripe",
])
def test_cram31_method_matrix_on_sequences(method):
    rng = random.Random(hash(method) & 0xFFFF)
    recs = _records(rng, n=10)
    methods = {8: method, 9: method}
    blob = simple_cram(recs, block_methods=methods, version=(3, 1))
    assert decode_cram(blob) == _expected(recs)


def test_cram31_end_to_end_pure_python(monkeypatch):
    """The same all-new-methods file decodes identically with the
    native library disabled (python is the reference implementation)."""
    monkeypatch.setenv("JF_NO_NATIVE", "1")
    rng = random.Random(314)
    recs = _records(rng)
    series = cw.default_series()
    series["RN"] = ByteArrayStop(0, 6)
    methods = {cid: "arith" for cid in range(1, 8)}
    methods[6] = "tok3"
    methods[8] = "rans16-o1"
    methods[9] = fqz_method([len(r["qual"]) for r in recs])
    methods["slice_header"] = "rans16"
    blob = simple_cram(recs, series=series, block_methods=methods,
                       version=(3, 1))
    assert decode_cram(blob) == _expected(recs)


def test_cram31_tok3_arith_names():
    rng = random.Random(555)
    recs = _records(rng, n=12)
    series = cw.default_series()
    series["RN"] = ByteArrayStop(0, 6)
    blob = simple_cram(recs, series=series,
                       block_methods={6: "tok3-arith"}, version=(3, 1))
    assert decode_cram(blob) == _expected(recs)


def test_cram31_fqz_multiparam_and_rev():
    rng = random.Random(556)
    recs = _records(rng, n=15)
    lens = [len(r["qual"]) for r in recs]
    methods = {9: fqz_method(lens, nparam=2,
                             do_rev=[i % 2 == 0 for i in range(15)])}
    blob = simple_cram(recs, block_methods=methods, version=(3, 1))
    assert decode_cram(blob) == _expected(recs)


def test_cram31_gzip_outer_layer(tmp_path):
    import gzip

    from jellyfish_tpu.io.parse import open_stream, sam_records_to_fastx

    rng = random.Random(557)
    recs = _records(rng, n=8)
    blob = simple_cram(recs, block_methods={8: "rans16-o1"},
                       version=(3, 1))
    path = tmp_path / "r.cram.gz"
    path.write_bytes(gzip.compress(blob))
    out = b"".join(sam_records_to_fastx(open_stream(str(path))))
    assert out == _expected(recs)


def test_cram31_count_cli_equivalence(tmp_path, capsys):
    """`count` on a CRAM 3.1 file == `count` on the same reads as
    FASTQ (the reference consumption parity check, through the full
    CLI: sam_format.hpp role)."""
    from test_cli import run_cli, _dump_dict

    rng = random.Random(558)
    recs = _records(rng, n=20)
    lens = [len(r["qual"]) for r in recs]
    series = cw.default_series()
    series["RN"] = ByteArrayStop(0, 6)
    methods = {6: "tok3", 8: "rans16-o1", 9: fqz_method(lens)}
    cram_path = tmp_path / "r.cram"
    cram_path.write_bytes(simple_cram(recs, series=series,
                                      block_methods=methods,
                                      version=(3, 1)))
    fq_path = tmp_path / "r.fastq"
    fq_path.write_bytes(_expected(recs))
    out_c = tmp_path / "c.jf"
    out_f = tmp_path / "f.jf"
    run_cli(["count", "-m", "15", "-s", "16k", "-C", "--sam",
             str(cram_path), "-o", str(out_c)])
    run_cli(["count", "-m", "15", "-s", "16k", "-C",
             "-o", str(out_f), str(fq_path)])
    got = _dump_dict(capsys, str(out_c))
    assert got == _dump_dict(capsys, str(out_f)) and got


def test_cram31_sharded_devices_matches_single(tmp_path):
    """`count -d 8 --sam r31.cram` (8-device CPU mesh) dumps the same
    table as the single-chip run — CRAM 3.1 ingest composes with the
    sharded counter."""
    import os
    import subprocess
    import sys

    rng = random.Random(606)
    recs = _records(rng, n=16)
    series = cw.default_series()
    series["RN"] = ByteArrayStop(0, 6)
    methods = {6: "tok3", 8: "rans16-o1",
               9: fqz_method([len(r["qual"]) for r in recs])}
    cram_path = tmp_path / "r31.cram"
    cram_path.write_bytes(simple_cram(recs, series=series,
                                      block_methods=methods,
                                      version=(3, 1)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    def run_count(out, devices):
        r = subprocess.run(
            [sys.executable, "-m", "jellyfish_tpu", "count", "-m", "15",
             "-s", "16k", "-C", "-d", devices, "--sam", str(cram_path),
             "-o", str(out)],
            env=env, capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        d = subprocess.run(
            [sys.executable, "-m", "jellyfish_tpu", "dump", "-c",
             str(out)],
            env=env, capture_output=True, text=True, cwd="/root/repo")
        assert d.returncode == 0, d.stderr
        return sorted(d.stdout.splitlines())

    one = run_count(tmp_path / "one.jf", "1")
    eight = run_count(tmp_path / "eight.jf", "8")
    assert one and eight == one


def _seqs_of_fastx(buf: bytes):
    out = []
    lines = buf.split(b"\n")
    i = 0
    while i < len(lines):
        if not lines[i]:
            i += 1
            continue
        if lines[i][:1] == b"@":
            out.append(lines[i + 1])
            i += 4
        elif lines[i][:1] == b">":
            out.append(lines[i + 1])
            i += 2
        else:
            raise AssertionError(lines[i][:40])
    return out


def test_cram31_noqual_skips_quality_blocks():
    """need_quals=False: identical sequences, FASTA output, and the
    quality blocks are provably never decompressed (the htslib
    required-fields optimization) — on both the native and python
    paths."""
    import os

    rng = random.Random(77)
    recs = []
    for i in range(300):
        recs.append({
            "name": b"r%d" % i,
            "seq": bytes(rng.choices(b"ACGT", k=90)),
            "qual": bytes(rng.choices(range(30, 41), k=90)),
        })
    series = cw.default_series()
    series["RN"] = ByteArrayStop(0, 6)
    comp = cw.compression_header(series)
    sl = cw.encode_slice(
        series, recs,
        block_methods={cw.CORE: "rans16", 8: "rans16-o1",
                       9: fqz_method([90] * len(recs))})
    blob = b"".join([
        cw.file_definition(version=(3, 1)),
        cw.sam_header_container(b"@HD\tVN:1.6\n"),
        cw.data_container(comp, sl, 1 + cw.count_blocks(sl), len(recs), 0),
        cw.eof_container(),
    ])

    def run(need_quals, native):
        old = os.environ.get("JF_NO_NATIVE")
        try:
            if not native:
                os.environ["JF_NO_NATIVE"] = "1"
            elif old:
                del os.environ["JF_NO_NATIVE"]
            s = io.BytesIO(blob)
            s.read(4)
            return b"".join(cram_records_to_fastx(s, need_quals=need_quals))
        finally:
            if old is None:
                os.environ.pop("JF_NO_NATIVE", None)
            else:
                os.environ["JF_NO_NATIVE"] = old

    full_n = run(True, True)
    noq_n = run(False, True)
    noq_p = run(False, False)
    assert noq_n[:1] == b">"  # FASTA (no qualities reconstructed)
    assert _seqs_of_fastx(full_n) == _seqs_of_fastx(noq_n)
    assert noq_p == noq_n  # python reference path agrees byte-for-byte

    # the fqz quality block really is never decompressed in no-qual
    # mode: count _decompress calls by method
    import jellyfish_tpu.io.cram as cram_mod

    methods = []
    orig = cram_mod._decompress

    def counting(method, data, raw_size):
        methods.append(method)
        return orig(method, data, raw_size)

    cram_mod._decompress = counting
    try:
        run(False, True)
        assert cram_mod.METHOD_FQZ not in methods
        methods.clear()
        run(True, True)
        assert cram_mod.METHOD_FQZ in methods
    finally:
        cram_mod._decompress = orig
