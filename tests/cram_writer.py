"""Minimal CRAM 3.0 *writer* used to exercise the reader in
jellyfish_tpu/io/cram.py without htslib in the image.

Implements the spec subset the reader supports, with enough knobs to
cover the codec/encoding matrix: block compression methods raw / gzip /
bzip2 / lzma / rANS-order-0 / rANS-order-1; series encodings EXTERNAL,
HUFFMAN (constant and real multi-symbol codes), BETA, GAMMA, SUBEXP,
BYTE_ARRAY_LEN, BYTE_ARRAY_STOP; unmapped and mapped (feature-coded)
records; embedded / external / absent reference; AP delta; multi-slice
and multi-container layouts; tag data.

This is test scaffolding, not a product feature: the reference cannot
write CRAM either (htslib does). Keeping an independent encoder and
decoder pair, both written against the spec text, is the strongest
validation available in an image with no htslib/samtools/pysam.
"""

from __future__ import annotations

import struct
import zlib

from jellyfish_tpu.io import rans
from jellyfish_tpu.io.cram import write_itf8, write_ltf8, EOF_POSITION

CORE = "core"


def itf8(v: int) -> bytes:
    out = bytearray()
    write_itf8(out, v)
    return bytes(out)


def ltf8(v: int) -> bytes:
    out = bytearray()
    write_ltf8(out, v)
    return bytes(out)


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([self.acc << (8 - self.nbits)])
        return bytes(self.buf)


# ---------------------------------------------------------------- codecs
# Each encoder: .codec id, .params bytes, and write_int / write_byte /
# write_array(sink) where sink is the _Sink below.


class _Sink:
    """Destination streams while encoding one slice."""

    def __init__(self):
        self.core = BitWriter()
        self.ext = {}

    def extbuf(self, cid: int) -> bytearray:
        return self.ext.setdefault(cid, bytearray())


class External:
    codec = 1

    def __init__(self, cid: int):
        self.cid = cid
        self.params = itf8(cid)

    def write_int(self, sink, v):
        write_itf8(sink.extbuf(self.cid), v)

    def write_byte(self, sink, v):
        sink.extbuf(self.cid).append(v)

    def write_bytes(self, sink, data):
        sink.extbuf(self.cid).extend(data)


class Huffman:
    """Canonical huffman: explicit (symbol, length) lists. Lengths all 0
    with one symbol = the constant form."""
    codec = 3

    def __init__(self, syms, lens):
        self.params = itf8(len(syms)) + b"".join(itf8(s) for s in syms) \
            + itf8(len(lens)) + b"".join(itf8(x) for x in lens)
        self.codes = {}
        if len(syms) == 1 and lens[0] == 0:
            self.const = syms[0]
            return
        self.const = None
        pairs = sorted(zip(lens, range(len(syms))))
        code = 0
        prev = pairs[0][0]
        for ln, idx in pairs:
            code <<= ln - prev
            prev = ln
            self.codes[syms[idx]] = (ln, code)
            code += 1

    def write_int(self, sink, v):
        if self.const is not None:
            assert v == self.const, "huffman constant mismatch"
            return
        ln, code = self.codes[v]
        sink.core.write_bits(code, ln)

    write_byte = write_int


class Beta:
    codec = 6

    def __init__(self, offset: int, nbits: int):
        self.offset = offset
        self.nbits = nbits
        self.params = itf8(offset) + itf8(nbits)

    def write_int(self, sink, v):
        sink.core.write_bits(v + self.offset, self.nbits)

    write_byte = write_int


class Gamma:
    codec = 9

    def __init__(self, offset: int):
        self.offset = offset
        self.params = itf8(offset)

    def write_int(self, sink, v):
        v = v + self.offset
        assert v >= 1, "gamma needs positive values"
        n = v.bit_length() - 1
        sink.core.write_bits(0, n)   # n zeros
        sink.core.write_bits(v, n + 1)  # leading 1 + n low bits

    write_byte = write_int


class SubExp:
    codec = 7

    def __init__(self, offset: int, k: int):
        self.offset = offset
        self.k = k
        self.params = itf8(offset) + itf8(k)

    def write_int(self, sink, v):
        n = v + self.offset
        if n < (1 << self.k):
            sink.core.write_bits(0, 1)
            sink.core.write_bits(n, self.k)
        else:
            b = n.bit_length() - 1
            u = b - self.k + 1
            sink.core.write_bits((1 << u) - 1, u)  # u ones
            sink.core.write_bits(0, 1)
            sink.core.write_bits(n - (1 << b), b)

    write_byte = write_int


class ByteArrayLen:
    codec = 4

    def __init__(self, len_codec, val_codec):
        self.len_codec = len_codec
        self.val_codec = val_codec
        self.params = (itf8(len_codec.codec) + itf8(len(len_codec.params))
                       + len_codec.params + itf8(val_codec.codec)
                       + itf8(len(val_codec.params)) + val_codec.params)

    def write_array(self, sink, data):
        self.len_codec.write_int(sink, len(data))
        self.val_codec.write_bytes(sink, data)

    def write_bytes(self, sink, data):
        self.val_codec.write_bytes(sink, data)


class ByteArrayStop:
    codec = 5

    def __init__(self, stop: int, cid: int):
        self.stop = stop
        self.cid = cid
        self.params = bytes([stop]) + itf8(cid)

    def write_array(self, sink, data):
        assert self.stop not in data
        sink.extbuf(self.cid).extend(data + bytes([self.stop]))


def ext_array(cid: int) -> ByteArrayLen:
    """The common htslib shape: BYTE_ARRAY_LEN with external lengths
    and external values sharing one block."""
    return ByteArrayLen(External(cid), External(cid))


# ---------------------------------------------------------------- blocks

METHODS = {"raw": 0, "gzip": 1, "bzip2": 2, "lzma": 3,
           "rans0": 4, "rans1": 4,
           "rans16": 5, "rans16-o1": 5, "rans16-x32": 5,
           "rans16-o1x32": 5, "rans16-cat": 5, "rans16-rle": 5,
           "rans16-pack": 5, "rans16-packrle": 5, "rans16-stripe": 5,
           "arith": 6, "arith-o1": 6, "arith-rle": 6, "arith-o1rle": 6,
           "arith-pack": 6, "arith-ext": 6, "arith-cat": 6,
           "arith-stripe": 6,
           "tok3": 8, "tok3-arith": 8}


def _compress(method: str, data: bytes) -> bytes:
    if method == "raw":
        return data
    if method == "gzip":
        import gzip
        return gzip.compress(data)
    if method == "bzip2":
        import bz2
        return bz2.compress(data)
    if method == "lzma":
        import lzma
        return lzma.compress(data)
    if method == "rans0":
        return rans.encode(data, 0)
    if method == "rans1":
        return rans.encode(data, 1)
    if method.startswith("rans16"):
        from jellyfish_tpu.io import rans16 as r16
        flags = {"rans16": 0, "rans16-o1": r16.F_ORDER1,
                 "rans16-x32": r16.F_N32,
                 "rans16-o1x32": r16.F_ORDER1 | r16.F_N32,
                 "rans16-cat": r16.F_CAT, "rans16-rle": r16.F_RLE,
                 "rans16-pack": r16.F_PACK,
                 "rans16-packrle": r16.F_PACK | r16.F_RLE,
                 "rans16-stripe": r16.F_STRIPE}[method]
        return r16.encode(data, flags)
    if method.startswith("arith"):
        from jellyfish_tpu.io import arith as ar
        flags = {"arith": 0, "arith-o1": ar.F_ORDER1,
                 "arith-rle": ar.F_RLE,
                 "arith-o1rle": ar.F_ORDER1 | ar.F_RLE,
                 "arith-pack": ar.F_PACK, "arith-ext": ar.F_EXT,
                 "arith-cat": ar.F_CAT, "arith-stripe": ar.F_STRIPE}[method]
        return ar.encode(data, flags)
    if method.startswith("tok3"):
        from jellyfish_tpu.io import tok3
        return tok3.encode(data, use_arith=method == "tok3-arith")
    raise ValueError(method)


def fqz_method(lens, **kw):
    """A `block_methods` value for QS blocks: closes over the record
    lengths the fqzcomp model needs (method id 7)."""
    def _m(data: bytes):
        from jellyfish_tpu.io import fqzcomp
        return 7, fqzcomp.encode(list(lens), data, **kw)
    return _m


def block(ctype: int, cid: int, data: bytes, method="raw",
          v3: bool = True) -> bytes:
    if callable(method):
        method_id, comp = method(data)
    else:
        method_id, comp = METHODS[method], _compress(method, data)
    head = bytearray([method_id, ctype])
    write_itf8(head, cid)
    write_itf8(head, len(comp))
    write_itf8(head, len(data))
    payload = bytes(head) + comp
    if not v3:  # 2.x blocks carry no CRC32
        return payload
    return payload + struct.pack("<I", zlib.crc32(payload))


def container(blocks: bytes, n_blocks: int, ref_id: int = -1,
              start: int = 0, span: int = 0, n_records: int = 0,
              record_counter: int = 0, bases: int = 0,
              landmarks=(), v3: bool = True) -> bytes:
    head = bytearray()
    write_itf8(head, ref_id)
    write_itf8(head, start)
    write_itf8(head, span)
    write_itf8(head, n_records)
    # 2.x: itf8 record counter, no header CRC32 (bases stays ltf8)
    (write_ltf8 if v3 else write_itf8)(head, record_counter)
    write_ltf8(head, bases)
    write_itf8(head, n_blocks)
    write_itf8(head, len(landmarks))
    for lm in landmarks:
        write_itf8(head, lm)
    raw = struct.pack("<i", len(blocks)) + bytes(head)
    if not v3:
        return raw + blocks
    return raw + struct.pack("<I", zlib.crc32(raw)) + blocks


# ------------------------------------------------------------- documents


def _map_bytes(entries) -> bytes:
    """size-prefixed map: itf8 total size, itf8 count, entries."""
    body = bytearray()
    write_itf8(body, len(entries))
    for e in entries:
        body += e
    return itf8(len(body)) + bytes(body)


def compression_header(series: dict, rn_preserved=True, ap_delta=True,
                       rr=True, subst=b"\x1b" * 5, tag_dict=None,
                       tag_encodings=None, extra_pres=()) -> bytes:
    pres = [
        b"RN" + bytes([int(rn_preserved)]),
        b"AP" + bytes([int(ap_delta)]),
        b"RR" + bytes([int(rr)]),
        b"SM" + subst,
    ]
    pres.extend(extra_pres)  # raw key+value entries (legacy keys etc.)
    if tag_dict is not None:
        blob = b"".join(b"".join(line) + b"\x00" for line in tag_dict)
        pres.append(b"TD" + itf8(len(blob)) + blob)
    enc = []
    for key, codec in series.items():
        enc.append(key.encode() + itf8(codec.codec)
                   + itf8(len(codec.params)) + codec.params)
    tags = []
    for key, codec in (tag_encodings or {}).items():
        tags.append(itf8(key) + itf8(codec.codec)
                    + itf8(len(codec.params)) + codec.params)
    return _map_bytes(pres) + _map_bytes(enc) + _map_bytes(tags)


def slice_header(ref_id, start, span, n_records, record_counter,
                 content_ids, embedded_ref_id=-1, v3: bool = True) -> bytes:
    out = bytearray()
    write_itf8(out, ref_id)
    write_itf8(out, start)
    write_itf8(out, span)
    write_itf8(out, n_records)
    (write_ltf8 if v3 else write_itf8)(out, record_counter)
    write_itf8(out, 1 + len(content_ids))  # core + externals
    write_itf8(out, len(content_ids))
    for cid in content_ids:
        write_itf8(out, cid)
    write_itf8(out, embedded_ref_id)
    out += b"\x00" * 16  # md5 (not verified by the reader)
    return bytes(out)


def file_definition(file_id=b"jellyfish-tpu-test\x00\x00",
                    version=(3, 0)) -> bytes:
    assert len(file_id) == 20
    return b"CRAM" + bytes(version) + file_id


def sam_header_container(text: bytes, method="raw", v3: bool = True) -> bytes:
    data = struct.pack("<i", len(text)) + text
    blk = block(0, 0, data, method, v3=v3)
    return container(blk, 1, v3=v3)


def eof_container(v3: bool = True) -> bytes:
    empty_comp = compression_header({})
    blk = block(1, 0, empty_comp, v3=v3)
    return container(blk, 1, ref_id=-1, start=EOF_POSITION, span=0,
                     n_records=0, v3=v3)


# ---------------------------------------------------------------- slices

#   record dicts:
#     unmapped: {"name", "seq", "qual" (bytes|None)}
#     mapped:   {"name", "pos", "rlen", "features": [(readpos1based,
#                code_char, payload)], "qual" (bytes|None), "mapped": True,
#                "ref_id": int (only for multiref slices)}
#   payload per code: 'X' int, 'I'/'S'/'b'/'q' bytes, 'i' byte,
#                'D'/'N'/'P'/'H' int, 'B' (base, qual), 'Q' int.

_FEAT_SERIES = {"X": ("BS", "int"), "I": ("IN", "array"),
                "i": ("BA", "byte"), "D": ("DL", "int"),
                "N": ("RS", "int"), "S": ("SC", "array"),
                "P": ("PD", "int"), "H": ("HC", "int"),
                "b": ("BB", "array"), "q": ("QQ", "array"),
                "Q": ("QS", "byte")}


def encode_slice(series: dict, records, ref_id=-1, start=0, span=0,
                 record_counter=0, ap_delta=True, rn_preserved=True,
                 embedded_ref=None, embedded_ref_id=99, multiref=False,
                 block_methods=None, tags=None, tag_encodings=None,
                 detached=False, v3: bool = True) -> bytes:
    """Encode one slice (header block + core + externals). `series`
    maps series keys to encoder objects; every content id used by the
    encoders becomes an external block. `tags`: list of (tag3bytes,
    value bytes) applied to every record, with tag_dict line 1."""
    sink = _Sink()
    last_pos = start
    for rec in records:
        mapped = rec.get("mapped", False)
        seq = rec.get("seq", b"")
        rlen = rec["rlen"] if mapped else len(seq)
        qual = rec.get("qual")
        bf = 0 if mapped else 4
        cf = (1 if qual is not None else 0) | (2 if detached else 0)
        series["BF"].write_int(sink, bf)
        series["CF"].write_int(sink, cf)
        if multiref:
            series["RI"].write_int(sink, rec.get("ref_id", ref_id))
        series["RL"].write_int(sink, rlen)
        pos = rec.get("pos", 0)
        if ap_delta:
            series["AP"].write_int(sink, pos - last_pos)
            last_pos = pos
        else:
            series["AP"].write_int(sink, pos)
        series["RG"].write_int(sink, -1)
        if rn_preserved:
            series["RN"].write_array(sink, rec["name"])
        if detached:
            series["MF"].write_int(sink, 0)
            if not rn_preserved:
                series["RN"].write_array(sink, rec["name"])
            series["NS"].write_int(sink, -1)
            series["NP"].write_int(sink, 0)
            series["TS"].write_int(sink, 0)
        series["TL"].write_int(sink, 1 if tags else 0)
        if tags:
            for (_tag3, value) in tags:
                key = _tag3[0] << 16 | _tag3[1] << 8 | _tag3[2]
                tag_encodings[key].write_array(sink, value)
        if mapped:
            feats = rec.get("features", [])
            series["FN"].write_int(sink, len(feats))
            prev = 0
            for (p, code, payload) in feats:
                series["FC"].write_byte(sink, ord(code))
                series["FP"].write_int(sink, p - prev)
                prev = p
                skey, kind = _FEAT_SERIES.get(code, (None, None))
                if code == "B":
                    series["BA"].write_byte(sink, payload[0])
                    series["QS"].write_byte(sink, payload[1])
                elif kind == "int":
                    series[skey].write_int(sink, payload)
                elif kind == "byte":
                    series[skey].write_byte(sink, payload)
                elif kind == "array":
                    series[skey].write_array(sink, payload)
            series["MQ"].write_int(sink, 30)
            if qual is not None:
                series["QS"].write_bytes(sink, qual)
        else:
            series["BA"].write_bytes(sink, seq)
            if qual is not None:
                series["QS"].write_bytes(sink, qual)

    if embedded_ref is not None:
        assert embedded_ref_id not in sink.ext, \
            "embedded_ref_id collides with a series block"
        sink.ext[embedded_ref_id] = bytearray(embedded_ref)
    methods = block_methods or {}
    cids = sorted(sink.ext)
    out = bytearray()
    out += block(2, 0, slice_header(
        -2 if multiref else ref_id, start, span, len(records),
        record_counter, cids,
        embedded_ref_id if embedded_ref is not None else -1, v3=v3),
        methods.get("slice_header", "raw"), v3=v3)
    out += block(5, 0, sink.core.getvalue(), methods.get(CORE, "raw"),
                 v3=v3)
    for cid in cids:
        out += block(4, cid, bytes(sink.ext[cid]),
                     methods.get(cid, "raw"), v3=v3)
    return bytes(out)


def default_series(multiref=False, detached=False, with_features=False,
                   rn_stop=False):
    """An all-EXTERNAL encoding map (htslib's usual shape), one content
    id per series."""
    s = {
        "BF": External(1), "CF": External(2), "RL": External(3),
        "AP": External(4), "RG": External(5),
        "RN": (ByteArrayStop(0, 6) if rn_stop else ext_array(6)),
        "TL": External(7), "BA": External(8), "QS": External(9),
    }
    if multiref:
        s["RI"] = External(10)
    if detached:
        s.update({"MF": External(11), "NS": External(12),
                  "NP": External(13), "TS": External(14)})
    if with_features:
        s.update({
            "FN": External(15), "FC": External(16), "FP": External(17),
            "BS": External(18), "IN": ext_array(19), "DL": External(20),
            "RS": External(21), "SC": ext_array(22), "PD": External(23),
            "HC": External(24), "BB": ext_array(25), "QQ": ext_array(26),
            "MQ": External(27),
        })
    return s


def data_container(comp_header: bytes, slices: bytes, n_blocks: int,
                   n_records: int, record_counter: int,
                   comp_method="raw", v3: bool = True) -> bytes:
    blocks = block(1, 0, comp_header, comp_method, v3=v3) + slices
    return container(blocks, n_blocks, ref_id=-1, start=0, span=0,
                     n_records=n_records, record_counter=record_counter,
                     v3=v3)


def count_blocks(slices_bytes: bytes, v3: bool = True) -> int:
    """Blocks are self-delimiting; count them for the container header."""
    from jellyfish_tpu.io.cram import ByteCursor, Block
    cur = ByteCursor(slices_bytes)
    n = 0
    while not cur.eof():
        Block(cur, has_crc=v3)
        n += 1
    return n


def simple_cram(records, sam_text=b"@HD\tVN:1.6\n", series=None,
                block_methods=None, version=(3, 0), **kw) -> bytes:
    """One-container CRAM holding `records` (see encode_slice).
    version=(2, 0) / (2, 1) emits legacy 2.x framing (no CRCs, itf8
    record counters)."""
    v3 = version[0] == 3
    series = series or default_series(
        multiref=kw.get("multiref", False),
        detached=kw.get("detached", False),
        with_features=any(r.get("mapped") for r in records))
    comp = compression_header(
        series,
        rn_preserved=kw.get("rn_preserved", True),
        ap_delta=kw.get("ap_delta", True),
        rr=kw.pop("rr", True),
        subst=kw.pop("subst", b"\x1b" * 5),
        tag_dict=kw.pop("tag_dict", None),
        tag_encodings=kw.get("tag_encodings"),
        extra_pres=kw.pop("extra_pres", ()))
    sl = encode_slice(series, records, block_methods=block_methods, v3=v3,
                      **kw)
    n_blocks = 1 + count_blocks(sl, v3=v3)
    return (file_definition(version=version)
            + sam_header_container(sam_text, v3=v3)
            + data_container(comp, sl, n_blocks, len(records), 0, v3=v3)
            + eof_container(v3=v3))
