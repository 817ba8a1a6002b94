#!/bin/sh
# Dedup/LSH scale rehearsal (VERDICT r7 task #5): generates
# deterministic synthetic corpora at 5k/15k/50k docs (the generator is
# graft.operators.ScaleRehearsal.genCorpus — distributed, hash-derived,
# no stored fixtures), runs the minhash-LSH pair search, connected-
# components clustering, and 13-gram decontamination at each size, and
# prints one JSON line per (size, op) plus a growth-exponent summary.
# Exits nonzero if any measure grows super-linearly beyond exponent 1.5
# (all-pairs behavior ~ 2.0). Results are recorded in BENCH_NOTES.md.
#
# Usage: tools/scale_rehearsal.sh [sizes...]    (default 5000 15000 50000)
cd "$(dirname "$0")/.." || exit 1
exec sbt -batch "runMain graft.operators.ScaleRehearsal $*"
