#!/bin/bash
# CPU smoke path (capability parity: the reference's train_cpu.sh, which
# ran the *_test.yaml mini-configs as de-facto integration tests).
# Builds a synthetic mini corpus when data/ is absent, then trains on CPU.
set -e
source path.sh
config=${1:-configs/ctc_test.yaml}
[ -f data/train.json ] || python $MAIN_ROOT/tools/gen_mini_corpus.py --out data
export OPENASR_DEVICE=cpu JAX_PLATFORMS=cpu
python -m openasr_tpu.bin.train $config
