#!/usr/bin/env perl
# Dump every (mer, count) record of a database through the pure-Perl
# binding (the role of the reference's examples/swig/dump.pl).
#
#   perl -I<repo>/perl examples/bindings/dump.pl counts.jf
use strict;
use warnings;
use JellyfishTPU;

@ARGV == 1 or die "usage: $0 db.jf\n";
my $r = JellyfishTPU::ReadMerFile->new($ARGV[0]);
print $r->mer, " ", $r->count, "\n" while $r->next_mer;
$r->close;
