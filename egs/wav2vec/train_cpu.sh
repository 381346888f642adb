#!/bin/bash
# CPU smoke path for the raw-waveform wav2vec CTC recipe: builds a tiny
# synthetic wave corpus when data/ is absent, then finetunes on CPU.
set -e
source path.sh
config=${1:-configs/wav2vec_ctc_test.yaml}
[ -f data/train_wav.json ] || \
    python $MAIN_ROOT/tools/gen_mini_corpus.py --out data --wave
export OPENASR_DEVICE=cpu JAX_PLATFORMS=cpu
python -m openasr_tpu.bin.train $config
