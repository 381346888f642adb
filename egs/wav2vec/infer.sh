#!/bin/bash
# Usage: ./infer.sh exp/wav2vec_ctc wav2vec_ctc
source path.sh

expdir=$1
model_type=${2:-wav2vec_ctc}

python -m openasr_tpu.bin.infer \
    --batch_frames 1000000 \
    --nbest 5 \
    --label_type tokens \
    --model_type $model_type \
    --model_pkg $expdir/last.pkg \
    --vocab_path data/train_chars.txt \
    --json_file data/test_wav.json \
    --output $expdir/hyp.txt \
    --add_blk \
    --ctc_beam 10
