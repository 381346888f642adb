#!/bin/bash
# CPU smoke path for the phone2char CLIs: synthetic phone/char pairs.
set -e
source path.sh
[ -f data/train.json ] || python $MAIN_ROOT/tools/gen_mini_corpus.py --out data
export OPENASR_DEVICE=cpu JAX_PLATFORMS=cpu
python -m openasr_tpu.bin.train_phone2char ${1:-configs/phone2char_test.yaml}
