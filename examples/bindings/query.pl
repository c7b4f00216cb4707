#!/usr/bin/env perl
# Query mers from the command line against a database through the
# pure-Perl binding (the role of the reference's examples/swig/query.pl).
#
#   perl -I<repo>/perl examples/bindings/query.pl counts.jf MER [MER...]
use strict;
use warnings;
use JellyfishTPU;

@ARGV >= 2 or die "usage: $0 db.jf mer [mer...]\n";
my $db = shift @ARGV;
my $q  = JellyfishTPU::QueryMerFile->new($db);
print "$_ ", $q->get($_), "\n" for @ARGV;
$q->close;
