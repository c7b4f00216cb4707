"""CRAM reader fuzz tiers.

1. Property fuzz: random records (unmapped + mapped with random but
   consistent feature lists) are encoded by tests/cram_writer.py and
   decoded by io/cram.py; the expected sequence/quality is rebuilt by an
   independent straight-line interpreter below (no shared code with the
   decoder's cursor machinery).
2. Mutation fuzz: random single-byte corruptions of a valid CRAM must
   either produce output or raise a clean exception — never hang,
   segfault (native rANS is bounds-checked) or return silently wrong
   *structure*.
"""

import io
import random

import pytest

import cram_writer as cw
from cram_writer import simple_cram
from jellyfish_tpu.io.cram import cram_records_to_fastx


def decode(blob: bytes) -> bytes:
    stream = io.BytesIO(blob)
    assert stream.read(4) == b"CRAM"
    return b"".join(cram_records_to_fastx(stream))


# ------------------------------------------------ independent rebuilder

SUBST_IDENT = b"\x1b" * 5  # code j -> j-th candidate (ACGTN order)


def expected_mapped_seq(ref: bytes, pos: int, rlen: int, features):
    """Straight-line reconstruction: walk the feature list once,
    tracking read/ref offsets exactly as the spec prose describes."""
    seq = bytearray(b"N" * rlen)
    qual = bytearray(rlen)
    have_qual = False
    ri = pos - 1
    out = 0

    def ref_at(i, n=1):
        chunk = ref[max(i, 0):max(i + n, 0)]
        return (b"N" * (min(i, 0) * -1 if i < 0 else 0) + chunk
                + b"N" * (n - len(chunk) - (0 if i >= 0 else -i)))

    for (p, code, payload) in features:
        idx = p - 1
        while out < idx:
            seq[out] = ref_at(ri)[0]
            out += 1
            ri += 1
        if code == "B":
            seq[out] = payload[0]
            qual[out] = payload[1]
            have_qual = True
            out += 1
            ri += 1
        elif code == "X":
            rb = ref_at(ri)[0]
            order = b"ACGTN"
            r = order.index(rb) if rb in order else 4
            cands = bytes(b for b in order if b != order[r])
            seq[out] = cands[payload]
            out += 1
            ri += 1
        elif code == "I":
            seq[out:out + len(payload)] = payload
            out += len(payload)
        elif code == "i":
            seq[out] = payload
            out += 1
        elif code == "D":
            ri += payload
        elif code == "N":
            ri += payload
        elif code == "S":
            seq[out:out + len(payload)] = payload
            out += len(payload)
        elif code == "P" or code == "H":
            pass
        elif code == "b":
            seq[out:out + len(payload)] = payload
            out += len(payload)
            ri += len(payload)
        elif code == "q":
            qual[idx:idx + len(payload)] = payload
            have_qual = True
        elif code == "Q":
            qual[idx] = payload
            have_qual = True
    while out < rlen:
        seq[out] = ref_at(ri)[0]
        out += 1
        ri += 1
    return bytes(seq), (bytes(qual) if have_qual else None)


def random_features(rng, rlen: int):
    """A consistent random feature list: read positions non-decreasing,
    consuming features never overrun the read."""
    feats = []
    out = 0  # next read index a consuming feature may claim
    while out < rlen and rng.random() < 0.75:
        p = rng.randrange(out, rlen) + 1  # 1-based
        room = rlen - (p - 1)
        code = rng.choice("XIiDNSPHbqQB")
        if code in "ISb":
            ln = rng.randrange(1, min(room, 4) + 1)
            payload = bytes(rng.choices(b"ACGT", k=ln))
            feats.append((p, code, payload))
            out = p - 1 + ln
        elif code == "B":
            feats.append((p, code, (rng.choice(b"ACGT"),
                                    rng.randrange(0, 60))))
            out = p
        elif code == "i":
            feats.append((p, code, rng.choice(b"ACGT")))
            out = p
        elif code == "X":
            feats.append((p, code, rng.randrange(4)))
            out = p
        elif code in "DN":
            feats.append((p, code, rng.randrange(1, 5)))
            out = p - 1
        elif code in "PH":
            feats.append((p, code, rng.randrange(1, 5)))
            out = p - 1
        elif code == "q":
            ln = rng.randrange(1, min(room, 4) + 1)
            feats.append((p, code, bytes(rng.randrange(50)
                                         for _ in range(ln))))
            out = p - 1
        elif code == "Q":
            feats.append((p, code, rng.randrange(50)))
            out = p - 1
    return feats


REF = bytes(random.Random(1234).choices(b"ACGT", k=500))


@pytest.mark.parametrize("seed", range(8))
def test_property_fuzz_mapped_reconstruction(seed):
    rng = random.Random(1000 + seed)
    records = []
    expected = []
    for i in range(12):
        if rng.random() < 0.4:  # unmapped
            seq = bytes(rng.choices(b"ACGTN", k=rng.randrange(1, 80)))
            qual = (bytes(rng.randrange(60) for _ in seq)
                    if rng.random() < 0.5 else None)
            records.append({"name": b"u%d" % i, "seq": seq, "qual": qual})
            expected.append((b"u%d" % i, seq, qual))
        else:
            rlen = rng.randrange(5, 90)
            pos = rng.randrange(1, len(REF) + 20)  # may hang off the end
            feats = random_features(rng, rlen)
            records.append({"name": b"m%d" % i, "mapped": True,
                            "pos": pos, "rlen": rlen, "features": feats,
                            "qual": None})
            seq, qual = expected_mapped_seq(REF, pos, rlen, feats)
            expected.append((b"m%d" % i, seq, qual))
    # positions are random, so AP delta encoding must handle negatives
    blob = simple_cram(
        records, embedded_ref=REF, ref_id=0, start=1, span=len(REF),
        ap_delta=bool(seed % 2),
        sam_text=b"@HD\tVN:1.6\n@SQ\tSN:f\tLN:%d\n" % len(REF),
        block_methods={cw.CORE: "rans0", 8: "rans1", 9: "gzip"})
    out = decode(blob)
    want = bytearray()
    for (name, seq, qual) in expected:
        if qual is None:
            want += b">" + name + b"\n" + seq + b"\n"
        else:
            q33 = bytes(min(q, 93) + 33 for q in qual)
            want += b"@" + name + b"\n" + seq + b"\n+\n" + q33 + b"\n"
    assert out == bytes(want)


def test_mutation_fuzz_never_hangs_or_crashes():
    rng = random.Random(77)
    records = [{"name": b"r%d" % i,
                "seq": bytes(rng.choices(b"ACGT", k=50)),
                "qual": bytes(rng.randrange(40) for _ in range(50))}
               for i in range(10)]
    base = simple_cram(records, block_methods={cw.CORE: "rans0",
                                               8: "rans1", 9: "rans0"})
    clean = decode(base)
    assert clean.count(b"\n+\n") == 10
    for trial in range(300):
        blob = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
        try:
            out = decode(bytes(blob))
            # structurally sane if it decodes at all
            assert isinstance(out, bytes)
        except Exception:
            pass  # clean failure is the expected outcome


def test_truncation_fuzz():
    records = [{"name": b"t", "seq": b"ACGT" * 25, "qual": None}]
    base = simple_cram(records)
    rng = random.Random(9)
    for _ in range(60):
        cut = rng.randrange(4, len(base))
        try:
            decode(base[:cut])
        except Exception:
            pass