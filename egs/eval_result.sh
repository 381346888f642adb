#!/bin/bash
# sclite-style scoring (reference: egs/eval_result.sh, which required an
# external sctk install; this wraps the in-repo tools/sclite_score.py).
#   eval_result.sh <ref> <hyp> <out> [--cer]
set -e
ref=$1
hyp=$2
out=$3
shift 3 || true
python "$(dirname "$0")/../tools/sclite_score.py" -r "$ref" --hyp "$hyp" -o "$out" "$@"
