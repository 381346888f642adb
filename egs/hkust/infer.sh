#!/bin/bash
# Usage: ./infer.sh exp/conv-transformer avg10.pkg
source path.sh

exp_dir=${1:-exp/conv-transformer}
pkg=${2:-avg10.pkg}

python -m openasr_tpu.bin.infer \
    --model_type conv-transformer \
    --model_pkg $exp_dir/$pkg \
    --vocab_path data/vocab.char \
    --json_file data/test.json \
    --output $exp_dir/decode_test/hyp.txt \
    --batch_frames 8000 \
    --nbest 5 \
    --maxlen 60 \
    --offline \
    --add_blk

python $MAIN_ROOT/tools/wer.py --cer \
    --hyp $exp_dir/decode_test/hyp.txt \
    --ref data/test_text.txt
