#!/usr/bin/env perl
# Minimal local job runner with Kaldi's run.pl interface:
#   run.pl [JOB=1:N] log.JOB.txt command args...
# Runs the command (with JOB substituted) locally, one process per job,
# capturing stdout/stderr into the log file; exits nonzero if any job
# fails. (Capability parity with the reference's tools/run.pl; rebuilt
# from the documented interface.)
use strict; use warnings;
my ($jobname, $jobstart, $jobend) = (undef, 1, 1);
if (@ARGV > 0 && $ARGV[0] =~ m/^([A-Za-z_][A-Za-z0-9_]*)=(\d+):(\d+)$/) {
  ($jobname, $jobstart, $jobend) = ($1, $2, $3);
  shift @ARGV;
}
@ARGV >= 2 or die "usage: run.pl [JOB=1:N] logfile command...\n";
my $logfile = shift @ARGV;
my $cmd = join(" ", @ARGV);
my @pids;
for my $job ($jobstart .. $jobend) {
  my ($c, $l) = ($cmd, $logfile);
  if (defined $jobname) { $c =~ s/$jobname/$job/g; $l =~ s/$jobname/$job/g; }
  my $pid = fork();
  die "fork failed" unless defined $pid;
  if ($pid == 0) {
    system("mkdir -p \$(dirname '$l') 2>/dev/null");
    open(my $fh, ">", $l) or die "cannot open $l";
    print $fh "# $c\n# started " . localtime() . "\n";
    close($fh);
    my $rc = system("( $c ) >>'$l' 2>&1");
    open($fh, ">>", $l); print $fh "# ended " . localtime() .
      " status " . ($rc >> 8) . "\n"; close($fh);
    exit($rc >> 8);
  }
  push @pids, $pid;
}
my $fail = 0;
for my $pid (@pids) { waitpid($pid, 0); $fail++ if $? != 0; }
if ($fail) { die "run.pl: $fail / " . scalar(@pids) . " jobs failed\n"; }
