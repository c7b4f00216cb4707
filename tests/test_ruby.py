"""Pure-Ruby binding (ruby/jellyfish_tpu.rb) — the reference's SWIG Ruby
surface (swig/mer_file.i, swig/string_mers.i, swig/ruby/) reimplemented
over the reference-compatible binary DB format. Cross-checked against the
Python readers on the same DB, mirroring swig/ruby/test_mer_file.rb's
strategy of comparing binding output to `jellyfish dump`.

Skips when no ruby interpreter is present (this image ships none; the
binding itself is pure stdlib Ruby and needs no toolchain)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna

ruby = shutil.which("ruby")
pytestmark = pytest.mark.skipif(ruby is None, reason="no ruby in PATH")

RB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ruby", "jellyfish_tpu.rb",
)


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.io.dumpers import dump_counter

    rng = np.random.default_rng(2718)
    seqs = [random_dna(rng, n, with_n=True) for n in (400, 211, 650)]
    k = 17
    c = MerCounter(k, size=1 << 10, canonical=True,
                   rng=np.random.default_rng(4))
    for s in seqs:
        c.add_chunk(np.frombuffer((s + "N").encode(), dtype=np.uint8))
    path = tmp_path_factory.mktemp("rubydb") / "ruby.jf"
    dump_counter(c, str(path), counter_len_bytes=4, val_len_bits=7,
                 max_reprobe=126, cmdline=["test"])
    return str(path), k, seqs


def run_ruby(script: str, *argv) -> str:
    r = subprocess.run(
        [ruby, "-r", RB, "-e", script, *argv],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_read_mer_file_matches_python_reader(db):
    path, k, seqs = db
    out = run_ruby(
        'r = JellyfishTPU::ReadMerFile.new(ARGV[0]);'
        'puts "#{r.mer} #{r.count}" while r.next_mer',
        path,
    )
    got = {m: int(c) for m, c in (l.split() for l in out.splitlines())}
    from jellyfish_tpu.io.files import DBReader
    from jellyfish_tpu.mer import MerDNA

    with DBReader(path) as r:
        want = {str(MerDNA(k, int(m))): int(c) for m, c in r}
    assert got == want
    assert got == {
        str(MerDNA(k, m)): c for m, c in oracle_counts(seqs, k, True).items()
    }


def test_query_mer_file(db):
    path, k, seqs = db
    from jellyfish_tpu.io.files import DBReader
    from jellyfish_tpu.mer import MerDNA

    with DBReader(path) as r:
        recs = [(str(MerDNA(k, int(m))), int(c)) for m, c in r]
    present = [recs[0], recs[len(recs) // 2], recs[-1]]
    absent = "A" * k
    want_absent = dict(recs).get(absent, 0)
    out = run_ruby(
        'q = JellyfishTPU::QueryMerFile.new(ARGV.shift);'
        'ARGV.each { |m| puts q.get(m) }',
        path, *[m for m, _ in present], absent,
    )
    vals = [int(x) for x in out.splitlines()]
    assert vals == [c for _, c in present] + [want_absent]


def test_query_canonicalizes(db):
    path, k, seqs = db
    from jellyfish_tpu.io.files import DBReader
    from jellyfish_tpu.mer import MerDNA

    with DBReader(path) as r:
        m0, c0 = next(iter(r))
    mer = MerDNA(k, int(m0))
    rc = str(mer.get_reverse_complement())
    out = run_ruby(
        'q = JellyfishTPU::QueryMerFile.new(ARGV[0]); puts q.get(ARGV[1])',
        path, rc,
    )
    assert int(out.strip()) == int(c0)


def test_string_mers_iterator():
    out = run_ruby(
        'JellyfishTPU.string_mers("ACGTNACGTT", 4).each { |m| puts m }'
    )
    assert out.split() == ["ACGT", "ACGT", "CGTT"]
    out = run_ruby(
        'JellyfishTPU.string_canonicals("AAATT", 4).each { |m| puts m }'
    )
    assert out.split() == ["AAAT", "AATT"]


def test_mer_dna_ops():
    out = run_ruby(
        'm = JellyfishTPU::MerDNA.new("ACGTA");'
        'puts m.get_reverse_complement;'
        'puts m.get_canonical;'
        'puts m.shift_left("C");'
        'puts JellyfishTPU::MerDNA.from_bits(m.bits, 5)'
    )
    rc, canon, shifted, roundtrip = out.split()
    assert rc == "TACGT"
    assert canon == "ACGTA"
    assert shifted == "CGTAC"
    assert roundtrip == shifted


def test_hash_counter_and_set():
    """Mirror of the reference's swig/ruby/test_hash_counter.rb
    semantics (add newness + accumulate, update_add existing-only,
    get/[] nil for absent; HashSet membership; size doubling)."""
    out = run_ruby(
        'require "jellyfish_tpu"; include JellyfishTPU;'
        'srand(42);'
        'h = HashCounter.new(1024, 5);'
        'puts "#{h.size} #{h.val_len}";'
        'oracle = Hash.new(0); ok = true;'
        'm = MerDNA.new("A" * 25);'
        '1000.times do |i|'
        '  m.randomize!;'
        '  val = rand(1000);'
        '  was_new = !oracle.key?(m.to_s);'
        '  ok &&= (h.add(m, val) == was_new);'
        '  oracle[m.to_s] += val;'
        '  if i % 3 == 1 then nv = rand(1000);'
        '    ok &&= !h.add(m, nv); oracle[m.to_s] += nv;'
        '  elsif i % 3 == 2 then nv = rand(1000);'
        '    ok &&= h.update_add(m, nv); oracle[m.to_s] += nv; end;'
        '  ok &&= (h.get(m) == oracle[m.to_s]) && (h[m] == oracle[m.to_s]);'
        'end;'
        'absent = MerDNA.new("N" * 25);'
        'ok &&= h.get(absent).nil? && !h.update_add(absent, 1);'
        'puts(ok ? "OK" : "FAIL");'
        's = HashSet.new(16); sok = true;'
        'sok &&= s.add(MerDNA.new("ACGT"));'
        'sok &&= !s.add(MerDNA.new("ACGT"));'
        'sok &&= s.get(MerDNA.new("ACGT")) && s[MerDNA.new("ACGT")];'
        'sok &&= !s.get(MerDNA.new("TTTT"));'
        '100.times { s.add(MerDNA.new("A" * 10).randomize!.to_s) };'
        'sok &&= s.size >= 128;'
        'puts(sok ? "OK" : "FAIL")'
    )
    first, ok, sok = out.split("\n")[:3]
    assert first == "1024 5"
    assert ok == "OK"
    assert sok == "OK"
