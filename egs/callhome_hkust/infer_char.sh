#!/bin/bash
# Decode char-target models (reference: egs/callhome_hkust/infer_char.sh)
set -e
source path.sh
exp_dir=${1:-exp/conv-transformer_ma}
pkg=${2:-avg10.pkg}
python -m openasr_tpu.bin.infer \
    --model_type conv-transformer \
    --model_pkg $exp_dir/$pkg \
    --vocab_path data/chars_ma.txt \
    --json_file data/test_ma.json \
    --output $exp_dir/decode_test/hyp.txt \
    --batch_frames 8000 \
    --nbest 5 \
    --maxlen 80 \
    --offline
python $MAIN_ROOT/tools/wer.py --cer \
    --hyp $exp_dir/decode_test/hyp.txt --ref data/test_ma_text.txt
