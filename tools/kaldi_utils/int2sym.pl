#!/usr/bin/env perl
# Map integer ids back to symbols using a symtab ("sym id" lines).
# -f N[-M] selects which fields to map (1-based, inclusive; open-ended
# with "N-"). (capability parity with the reference's tools/int2sym.pl)
use strict; use warnings;
my ($from, $to) = (1, -1);
if (@ARGV && $ARGV[0] eq "-f") {
  shift @ARGV;
  my $spec = shift @ARGV;
  if ($spec =~ /^(\d+)-(\d*)$/) { ($from, $to) = ($1, $2 eq "" ? -1 : $2); }
  elsif ($spec =~ /^(\d+)$/) { ($from, $to) = ($1, $1); }
  else { die "int2sym.pl: bad field spec $spec\n"; }
}
@ARGV >= 1 or die "usage: int2sym.pl [-f N[-M]] symtab [input] > output\n";
my $symtab = shift @ARGV;
open(my $fh, "<", $symtab) or die "cannot open $symtab";
my @sym;
while (<$fh>) {
  my ($s, $i) = split;
  next unless defined $i;
  $sym[$i] = $s;
}
close($fh);
while (<>) {
  chomp;
  my @f = split;
  for my $i (0 .. $#f) {
    my $pos = $i + 1;
    next if $pos < $from || ($to != -1 && $pos > $to);
    if ($f[$i] =~ /^\d+$/) {
      defined $sym[$f[$i]] or die "int2sym.pl: no symbol for id $f[$i]\n";
      $f[$i] = $sym[$f[$i]];
    }
  }
  print join(" ", @f), "\n";
}
