#!/usr/bin/env perl
# Keep lines of an scp-like file whose first field appears in an id list
# (first field of each line of the filter file). -f N selects the field
# to match on (1-based); --exclude inverts.
# (capability parity with the reference's tools/filter_scp.pl)
use strict; use warnings;
my ($field, $exclude) = (1, 0);
while (@ARGV && $ARGV[0] =~ /^-/) {
  my $a = shift @ARGV;
  if ($a eq "-f") { $field = shift @ARGV; }
  elsif ($a eq "--exclude") { $exclude = 1; }
  else { die "filter_scp.pl: unknown option $a\n"; }
}
@ARGV == 1 || @ARGV == 2 or
  die "usage: filter_scp.pl [-f N] [--exclude] id_list [in.scp] > out.scp\n";
my $idlist = shift @ARGV;
open(my $fh, "<", $idlist) or die "cannot open $idlist";
my %ids;
while (<$fh>) { my @f = split; $ids{$f[0]} = 1 if @f; }
close($fh);
while (<>) {
  my @f = split;
  next unless @f >= $field;
  my $hit = exists $ids{$f[$field-1]} ? 1 : 0;
  print if $hit != $exclude;
}
