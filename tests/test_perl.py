"""Pure-Perl binding (perl/JellyfishTPU.pm) — the reference's SWIG Perl
surface (swig/mer_file.i, swig/string_mers.i) reimplemented over the
reference-compatible binary DB format. Cross-checked against the Python
readers on the same DB, mirroring swig/perl5/test_mer_file.t's strategy of
comparing binding output to `jellyfish dump`."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from tests.conftest import oracle_counts, random_dna

perl = shutil.which("perl")
pytestmark = pytest.mark.skipif(perl is None, reason="no perl in PATH")


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.io.dumpers import dump_counter

    rng = np.random.default_rng(31415)
    seqs = [random_dna(rng, n, with_n=True) for n in (400, 211, 650)]
    k = 17
    c = MerCounter(k, size=1 << 10, canonical=True,
                   rng=np.random.default_rng(4))
    for s in seqs:
        c.add_chunk(np.frombuffer((s + "N").encode(), dtype=np.uint8))
    path = tmp_path_factory.mktemp("perldb") / "perl.jf"
    dump_counter(c, str(path), counter_len_bytes=4, val_len_bits=7,
                 max_reprobe=126, cmdline=["test"])
    return str(path), k, seqs


PERL_LIB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "perl"
)


def run_perl(script: str, *argv) -> str:
    r = subprocess.run(
        [perl, "-I", PERL_LIB, "-e", script, *argv],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_read_mer_file_matches_python_reader(db):
    path, k, seqs = db
    out = run_perl(
        'use JellyfishTPU; my $r = JellyfishTPU::ReadMerFile->new($ARGV[0]);'
        'print $r->mer, " ", $r->count, "\n" while $r->next_mer;',
        path,
    )
    got = dict(
        (m, int(c)) for m, c in (l.split() for l in out.splitlines())
    )
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
    absent = "A" * k  # poly-A unlikely in random data; check either way
    want_absent = dict(recs).get(absent, 0)
    script = (
        'use JellyfishTPU;'
        'my $q = JellyfishTPU::QueryMerFile->new(shift @ARGV);'
        'print $q->get($_), "\n" for @ARGV;'
    )
    out = run_perl(script, path, *[m for m, _ in present], absent)
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
    out = run_perl(
        'use JellyfishTPU;'
        'my $q = JellyfishTPU::QueryMerFile->new(shift @ARGV);'
        'print $q->get($ARGV[0]), "\n";',
        path, rc,
    )
    assert int(out.strip()) == int(c0)


def test_string_mers_iterator():
    out = run_perl(
        'use JellyfishTPU;'
        'my $it = JellyfishTPU::string_mers("ACGTNACGTT", 4);'
        'while (defined(my $m = $it->())) { print $m, "\n"; }'
    )
    assert out.split() == ["ACGT", "ACGT", "CGTT"]
    out = run_perl(
        'use JellyfishTPU;'
        'my $it = JellyfishTPU::string_canonicals("AAATT", 4);'
        'while (defined(my $m = $it->())) { print $m, "\n"; }'
    )
    # AAAT -> AAAT (canonical vs ATTT); AATT -> AATT (palindrome-ish min)
    assert out.split() == ["AAAT", "AATT"]


def test_mer_dna_ops():
    out = run_perl(
        'use JellyfishTPU;'
        'my $m = JellyfishTPU::MerDNA->new("ACGTA");'
        'print $m->get_reverse_complement, "\n";'
        'print $m->get_canonical, "\n";'
        'print $m->shift_left("C"), "\n";'
        'print JellyfishTPU::MerDNA->from_bits($m->bits, 5), "\n";'
    )
    rc, canon, shifted, roundtrip = out.split()
    assert rc == "TACGT"
    assert canon == "ACGTA"
    assert shifted == "CGTAC"
    assert roundtrip == shifted


def test_hash_counter_and_set():
    """Mirror of the reference's swig/perl5/t/test_hash_counter.t
    semantics: add accumulates + reports newness, update_add only
    touches existing mers, get returns undef for absent mers; HashSet
    add/get membership; size() doubles as the hash fills."""
    out = run_perl(
        'use JellyfishTPU;'
        'srand(42);'
        'my $h = JellyfishTPU::HashCounter->new(1024, 5);'
        'print $h->size, " ", $h->val_len, "\n";'
        'my %oracle;'
        'my $ok = 1;'
        'my $m = JellyfishTPU::MerDNA->new("A" x 25);'
        'for my $i (0 .. 999) {'
        '  $m->randomize;'
        '  my $val = int(rand(1000));'
        '  my $was_new = !exists $oracle{"$m"};'
        '  $ok &&= ($h->add($m, $val) ? 1 : 0) == ($was_new ? 1 : 0);'
        '  $oracle{"$m"} += $val;'
        '  if ($i % 3 == 1) { my $nv = int(rand(1000));'
        '    $ok &&= !$h->add($m, $nv); $oracle{"$m"} += $nv; }'
        '  elsif ($i % 3 == 2) { my $nv = int(rand(1000));'
        '    $ok &&= $h->update_add($m, $nv); $oracle{"$m"} += $nv; }'
        '  $ok &&= $h->get($m) == $oracle{"$m"};'
        '}'
        'for my $k (keys %oracle) {'
        '  $ok &&= $h->get(JellyfishTPU::MerDNA->new($k)) == $oracle{$k};'
        '}'
        'my $absent = JellyfishTPU::MerDNA->new("N" x 25);'
        '$ok &&= !defined $h->get($absent);'
        '$ok &&= !$h->update_add($absent, 1);'
        '$ok &&= !defined $h->get($absent);'
        'print $ok ? "OK" : "FAIL", "\n";'
        'my $s = JellyfishTPU::HashSet->new(16);'
        'my $sok = 1;'
        '$sok &&= $s->add(JellyfishTPU::MerDNA->new("ACGT"));'
        '$sok &&= !$s->add(JellyfishTPU::MerDNA->new("ACGT"));'
        '$sok &&= $s->get(JellyfishTPU::MerDNA->new("ACGT"));'
        '$sok &&= !$s->get(JellyfishTPU::MerDNA->new("TTTT"));'
        'for my $i (1 .. 100) { $s->add(JellyfishTPU::MerDNA->new('
        '  JellyfishTPU::MerDNA->new("A" x 10)->randomize . "")); }'
        '$sok &&= $s->size >= 128;'
        'print $sok ? "OK" : "FAIL", "\n";'
    )
    first, ok, sok = out.split("\n")[:3]
    assert first == "1024 5"
    assert ok == "OK"
    assert sok == "OK"
