"""Sanitizer tier for the native codec decoders (SURVEY §5's race/
memory-safety "valgrind analogue" row).

The C++ decoders in native/chunker.cpp parse UNTRUSTED input (rANS 4x8,
rANS Nx16, adaptive arithmetic, fqzcomp).  This test builds them with
AddressSanitizer + UndefinedBehaviorSanitizer and drives the C ABI in a
subprocess over valid blobs and several hundred mutations each: any
out-of-bounds access, overflow or UB aborts the subprocess and fails
the test.  The python-level mutation fuzz (test_cram31.py,
test_cram_fuzz.py) checks *semantic* rejection; this tier checks
*memory safety* of the same surfaces.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "jellyfish_tpu", "native", "chunker.cpp")

DRIVER = r"""
import ctypes, random, sys

so_path = sys.argv[1]
lib = ctypes.CDLL(so_path)
for fn in ("jf_rans_decode", "jf_rans16_decode", "jf_arith_decode",
           "jf_fqz_decode"):
    f = getattr(lib, fn)
    f.restype = ctypes.c_long
    f.argtypes = [ctypes.c_char_p, ctypes.c_long,
                  ctypes.c_void_p, ctypes.c_long]

sys.path.insert(0, %(repo)r)
import os
os.environ["JF_NO_NATIVE"] = "1"   # encoders/reference stay pure python
from jellyfish_tpu.io import rans, rans16, arith, fqzcomp

rng = random.Random(20260818)
raw = bytes(rng.choices(b"ACGTN!#%%+5?I", k=4000))

blobs = []
blobs.append(("jf_rans_decode", rans.encode(raw, 1), len(raw)))
for fl in (0, rans16.F_ORDER1, rans16.F_PACK | rans16.F_RLE,
           rans16.F_ORDER1 | rans16.F_N32, rans16.F_STRIPE):
    blobs.append(("jf_rans16_decode", rans16.encode(raw, fl), len(raw)))
for fl in (0, arith.F_ORDER1 | arith.F_RLE, arith.F_PACK):
    blobs.append(("jf_arith_decode", arith.encode(raw, fl), len(raw)))
lens = [100] * 20
quals = bytes(rng.choices(b"ABCDEFGHI", k=2000))
blobs.append(("jf_fqz_decode",
              fqzcomp.encode(lens, quals,
                             pflags=fqzcomp.P_DO_LEN | fqzcomp.P_HAVE_QMAP
                             | fqzcomp.P_HAVE_PTAB | fqzcomp.P_HAVE_DTAB
                             | fqzcomp.P_HAVE_QTAB),
              len(quals)))

for fn, blob, out_len in blobs:
    f = getattr(lib, fn)
    buf = ctypes.create_string_buffer(out_len)
    n = f(blob, len(blob), buf, out_len)
    # no EXT blobs are driven, so every valid blob must decode natively
    assert n == out_len, (fn, n, out_len)
    for trial in range(300):
        mut = bytearray(blob)
        op = rng.randrange(4)
        if op == 0:
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        elif op == 1:
            del mut[rng.randrange(len(mut)):]
        elif op == 2:
            mut += bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 16)))
        else:
            for _ in range(rng.randrange(2, 8)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        buf = ctypes.create_string_buffer(out_len)
        f(bytes(mut), len(mut), buf, out_len)  # must not crash/overflow
print("ASAN_DRIVER_OK")
"""


@pytest.mark.slow
def test_native_decoders_under_asan(tmp_path):
    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    asan_so = tmp_path / "_jfnative_asan.so"
    build = subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17", "-shared", "-fPIC",
         "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
         SRC, "-o", str(asan_so)],
        capture_output=True, text=True)
    if build.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {build.stderr[:200]}")
    # find libasan to preload into the subprocess python
    probe = subprocess.run(["g++", "-print-file-name=libasan.so"],
                           capture_output=True, text=True)
    libasan = probe.stdout.strip()
    if not libasan or not os.path.exists(libasan):
        pytest.skip("libasan not found")
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER % {"repo": REPO})
    env = dict(os.environ)
    env["LD_PRELOAD"] = libasan
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env["UBSAN_OPTIONS"] = "halt_on_error=1:print_stacktrace=1"
    res = subprocess.run([sys.executable, str(driver), str(asan_so)],
                         capture_output=True, text=True, env=env,
                         timeout=600)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    assert "ASAN_DRIVER_OK" in res.stdout
