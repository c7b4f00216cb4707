package JellyfishTPU;
# Pure-Perl binding for jellyfish_tpu databases — the role of the
# reference's SWIG Perl binding (swig/mer_file.i, swig/mer_dna.i,
# swig/string_mers.i) without needing SWIG or a C toolchain: the binary
# DB format is reference-compatible, so reading/querying it needs only
# core Perl (JSON::PP).
#
# Surface (mirrors swig/jellyfish.i class names):
#   JellyfishTPU::MerDNA          — k-mer string value type
#   JellyfishTPU::ReadMerFile     — stream (mer, count) records of a DB
#   JellyfishTPU::QueryMerFile    — random access count lookups (2k <= 64)
#   JellyfishTPU::string_mers / string_canonicals — mer iterators
#
# use lib '<repo>/perl'; use JellyfishTPU;
use strict;
use warnings;
use JSON::PP;

our $VERSION = '0.1';

# ---------------------------------------------------------------- MerDNA

package JellyfishTPU::MerDNA;
use overload '""' => sub { $_[0]->{s} }, 'eq' => sub { "$_[0]" eq "$_[1]" };

my %COMP = (A => 'T', C => 'G', G => 'C', T => 'A',
            a => 't', c => 'g', g => 'c', t => 'a');

sub new {
    my ($class, $s) = @_;
    return bless { s => uc($s // '') }, $class;
}
sub length { CORE::length($_[0]->{s}) }
sub k      { CORE::length($_[0]->{s}) }

sub get_reverse_complement {
    my ($self) = @_;
    my $rc = join '', map { $COMP{$_} // 'N' }
        split //, scalar reverse $self->{s};
    return JellyfishTPU::MerDNA->new($rc);
}
sub reverse_complement { $_[0]->{s} = $_[0]->get_reverse_complement->{s}; $_[0] }

sub get_canonical {
    my ($self) = @_;
    my $rc = $self->get_reverse_complement;
    return $self->{s} le $rc->{s} ? JellyfishTPU::MerDNA->new($self->{s}) : $rc;
}
sub canonicalize { $_[0]->{s} = $_[0]->get_canonical->{s}; $_[0] }

# shift a base in from the right/left, dropping one from the other end
# (mer_dna.hpp:322-370 sliding-window role, string-domain)
sub shift_left  { my ($s, $b) = @_; $s->{s} = substr($s->{s}, 1) . uc($b); $s }
sub shift_right { my ($s, $b) = @_;
                  $s->{s} = uc($b) . substr($s->{s}, 0, -1); $s }

# re-roll to a uniform random mer in place (SWIG MerDNA::randomize,
# used by the reference's hash tests); $k overrides the current length
sub randomize {
    my ($self, $k) = @_;
    $k //= CORE::length($self->{s}) || 16;
    $self->{s} = join '', map { ('A','C','G','T')[int(rand(4))] } 1 .. $k;
    return $self;
}

# 2-bit code (A0 C1 G2 T3, mer_dna.hpp:38-55) of base at string index i
my %CODE = (A => 0, C => 1, G => 2, T => 3);
sub code { $CODE{ substr($_[0]->{s}, $_[1], 1) } }

# numeric value of the mer (2 bits/base, leftmost base most significant);
# valid for k <= 32 on 64-bit perls
sub bits {
    my ($self) = @_;
    my $v = 0;
    for my $ch (split //, $self->{s}) {
        my $c = $CODE{$ch};
        die "MerDNA::bits: invalid base '$ch'" unless defined $c;
        $v = ($v << 2) | $c;
    }
    return $v;
}

sub from_bits {
    my ($class, $bits, $k) = @_;
    my @b;
    for my $i (0 .. $k - 1) {
        unshift @b, ('A', 'C', 'G', 'T')[$bits & 3];
        $bits >>= 2;
    }
    return $class->new(join '', @b);
}

# ------------------------------------------------------------- DB header

package JellyfishTPU::Header;

sub read {
    my ($class, $fh) = @_;
    CORE::read($fh, my $digits, 9) == 9 or die "truncated header length";
    $digits =~ /^\d{9}$/ or die "bad header length field";
    my $hlen = $digits + 0;
    CORE::read($fh, my $json, $hlen) == $hlen or die "truncated header";
    $json =~ s/\0+$//;
    my $root = JSON::PP->new->allow_bignum->decode($json);
    my $self = bless { root => $root, offset => 9 + $hlen }, $class;
    return $self;
}

sub _num { my $v = $_[0]; return ref($v) ? $v->bstr + 0 : $v + 0 }

sub key_len     { _num($_[0]->{root}{key_len}) }
sub counter_len { _num($_[0]->{root}{counter_len} // 4) }
sub size        { _num($_[0]->{root}{size}) }
sub format      { $_[0]->{root}{format} }
sub canonical   { $_[0]->{root}{canonical} ? 1 : 0 }
sub offset      { $_[0]->{offset} }

# GF(2) matrix times() for the position ordering (rectangular_binary
# _matrix.hpp:156 convention: bit 0 of key pairs with the LAST column)
sub matrix_columns {
    my ($self) = @_;
    my $m = $self->{root}{matrix1} or return undef;
    return undef if $m->{identity};
    return [map { _num($_) } @{ $m->{columns} }];
}

# ---------------------------------------------------------- ReadMerFile

package JellyfishTPU::ReadMerFile;

sub new {
    my ($class, $path) = @_;
    open my $fh, '<:raw', $path or die "open $path: $!";
    my $h = JellyfishTPU::Header->read($fh);
    $h->format eq 'binary/sorted'
        or die 'ReadMerFile requires a binary/sorted database';
    my $k = $h->key_len / 2;
    my $self = bless {
        fh => $fh, header => $h, k => $k,
        key_bytes => int(($h->key_len + 7) / 8),
        clen      => $h->counter_len,
        mer => undef, count => undef,
    }, $class;
    return $self;
}

sub header { $_[0]->{header} }

# advance; returns 1 and sets mer/count, or 0 at EOF (swig/mer_file.i
# next_mer semantics)
sub next_mer {
    my ($self) = @_;
    my $rec = $self->{key_bytes} + $self->{clen};
    my $got = CORE::read($self->{fh}, my $buf, $rec);
    return 0 if !$got;
    $got == $rec or die 'truncated record';
    my @bytes = unpack 'C*', substr($buf, 0, $self->{key_bytes});
    # little-endian 2-bit packed; base j (rightmost = j=k-1) is bit pair j
    my @bases;
    for my $j (0 .. $self->{k} - 1) {
        my $bit = 2 * $j;
        my $c = ($bytes[$bit >> 3] >> ($bit & 7)) & 3;
        unshift @bases, ('A', 'C', 'G', 'T')[$c];
    }
    $self->{mer} = JellyfishTPU::MerDNA->new(join '', @bases);
    my $cnt = 0;
    my @cb = unpack 'C*', substr($buf, $self->{key_bytes}, $self->{clen});
    $cnt = ($cnt << 8) | $cb[$_] for reverse 0 .. $#cb;
    $self->{count} = $cnt;
    return 1;
}

sub mer   { $_[0]->{mer} }
sub count { $_[0]->{count} }

sub close { CORE::close($_[0]->{fh}) }

# --------------------------------------------------------- QueryMerFile

package JellyfishTPU::QueryMerFile;

# Random-access lookups via binary search on (hash position, key) order
# (binary_dumper.hpp:148-189 role). Pure-Perl restriction: 2k <= 64.

sub new {
    my ($class, $path) = @_;
    open my $fh, '<:raw', $path or die "open $path: $!";
    my $h = JellyfishTPU::Header->read($fh);
    $h->format eq 'binary/sorted'
        or die 'QueryMerFile requires a binary/sorted database';
    $h->key_len <= 64 or die 'pure-Perl query supports k <= 32';
    my $self = bless {
        fh => $fh, header => $h, k => $h->key_len / 2,
        key_bytes => int(($h->key_len + 7) / 8),
        clen      => $h->counter_len,
        mask      => $h->size - 1,
        cols      => $h->matrix_columns,
        canonical => $h->canonical,
    }, $class;
    my @st = stat $fh;
    my $rec = $self->{key_bytes} + $self->{clen};
    my $data = $st[7] - $h->offset;
    $data % $rec == 0 or die 'db size not a multiple of record length';
    $self->{n} = $data / $rec;
    $self->{rec} = $rec;
    return $self;
}

sub _pos {
    my ($self, $key) = @_;
    my $cols = $self->{cols};
    return $key & $self->{mask} unless $cols;
    my $res = 0;
    my $k = $key;
    for (my $j = $#$cols; $j >= 0; $j--) {
        $res ^= $cols->[$j] if $k & 1;
        $k >>= 1;
    }
    return $res & $self->{mask};
}

sub _key_at {
    my ($self, $i) = @_;
    seek $self->{fh}, $self->{header}->offset + $i * $self->{rec}, 0;
    CORE::read($self->{fh}, my $buf, $self->{key_bytes});
    my $v = 0;
    my @b = unpack 'C*', $buf;
    $v = ($v << 8) | $b[$_] for reverse 0 .. $#b;
    return $v;
}

sub _val_at {
    my ($self, $i) = @_;
    seek $self->{fh},
        $self->{header}->offset + $i * $self->{rec} + $self->{key_bytes}, 0;
    CORE::read($self->{fh}, my $buf, $self->{clen});
    my $v = 0;
    my @b = unpack 'C*', $buf;
    $v = ($v << 8) | $b[$_] for reverse 0 .. $#b;
    return $v;
}

# count of a mer (string or MerDNA); canonicalizes if the DB is canonical
sub get {
    my ($self, $mer) = @_;
    my $m = ref $mer ? $mer : JellyfishTPU::MerDNA->new($mer);
    CORE::length("$m") == $self->{k}
        or die 'query mer length != database k';
    $m = $m->get_canonical if $self->{canonical};
    my $key = $m->bits;
    my $pos = $self->_pos($key);
    my ($lo, $hi) = (0, $self->{n});
    while ($lo < $hi) {
        my $mid  = int(($lo + $hi) / 2);
        my $mk   = $self->_key_at($mid);
        my $mp   = $self->_pos($mk);
        if ($mp < $pos || ($mp == $pos && $mk < $key)) { $lo = $mid + 1 }
        else                                           { $hi = $mid }
    }
    return 0 if $lo >= $self->{n};
    my $fk = $self->_key_at($lo);
    return $fk == $key ? $self->_val_at($lo) : 0;
}

sub close { CORE::close($_[0]->{fh}) }

# ---------------------------------------------------------- string mers

package JellyfishTPU;

# iterate all k-mers of a sequence string; invalid bases break windows
# (swig/string_mers.i role). Returns a closure iterator.
sub string_mers {
    my ($seq, $k, $canonical) = @_;
    my $i = 0;
    my $n = CORE::length($seq);
    return sub {
        OUTER: while ($i + $k <= $n) {
            my $w = uc substr($seq, $i, $k);
            $i++;
            if ($w =~ /[^ACGT]/) { next OUTER }
            my $m = JellyfishTPU::MerDNA->new($w);
            return $canonical ? $m->get_canonical : $m;
        }
        return undef;
    };
}

sub string_canonicals { string_mers($_[0], $_[1], 1) }

# ---------------------------------------------------- in-memory counting

# Counting hash on mer keys — the reference's SWIG HashCounter proxy
# (swig/hash_counter.i:13-58) for scripting-scale counting. Semantics
# match the SWIG tests (swig/perl5/t/test_hash_counter.t): add() always
# accumulates and returns TRUE iff the mer was new; update_add() adds
# only to existing mers; get() returns the count or undef; size() is
# the power-of-2 table size and doubles as the hash fills (the
# reference's cooperative size-doubling, host-dict-backed here).

package JellyfishTPU::HashCounter;

sub new {
    my ($class, $size, $val_len, $nb_threads) = @_;
    my $s = 1;
    $s <<= 1 while $s < ($size // 1024);
    return bless { size => $s, val_len => $val_len // 4, h => {} }, $class;
}
sub size    { $_[0]->{size} }
sub val_len { $_[0]->{val_len} }

sub add {
    my ($self, $mer, $v) = @_;
    my $k = "$mer";
    my $new = !exists $self->{h}{$k};
    $self->{h}{$k} += $v;
    $self->_grow;
    return $new;
}

sub update_add {
    my ($self, $mer, $v) = @_;
    my $k = "$mer";
    return 0 unless exists $self->{h}{$k};
    $self->{h}{$k} += $v;
    return 1;
}

sub get { my ($self, $mer) = @_; return $self->{h}{"$mer"} }

sub _grow {
    my ($self) = @_;
    $self->{size} <<= 1
        while scalar(keys %{ $self->{h} }) > $self->{size} * 0.7;
}

# Mer set — the reference's SWIG HashSet proxy (swig/hash_set.i:13-43):
# add() returns TRUE iff newly inserted; get() membership.

package JellyfishTPU::HashSet;

sub new {
    my ($class, $size, $nb_threads) = @_;
    my $s = 1;
    $s <<= 1 while $s < ($size // 1024);
    return bless { size => $s, h => {} }, $class;
}
sub size { $_[0]->{size} }

sub add {
    my ($self, $mer) = @_;
    my $k = "$mer";
    my $new = !exists $self->{h}{$k};
    $self->{h}{$k} = 1;
    $self->{size} <<= 1
        while scalar(keys %{ $self->{h} }) > $self->{size} * 0.7;
    return $new;
}

sub get { my ($self, $mer) = @_; return exists $self->{h}{"$mer"} ? 1 : 0 }

package JellyfishTPU;

1;
