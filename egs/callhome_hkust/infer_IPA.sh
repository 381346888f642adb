#!/bin/bash
# Decode IPA-target CTC models (reference: egs/callhome_hkust/infer_IPA.sh)
set -e
source path.sh
exp_dir=${1:-exp/ctc_IPA}
pkg=${2:-avg10.pkg}
python -m openasr_tpu.bin.infer \
    --model_type conv-ctc \
    --model_pkg $exp_dir/$pkg \
    --vocab_path data/phones.txt \
    --json_file data/test_IPA.json \
    --output $exp_dir/decode_test/hyp.txt \
    --batch_frames 8000 \
    --label_type phones \
    --offline \
    --add_blk
python $MAIN_ROOT/tools/wer.py \
    --hyp $exp_dir/decode_test/hyp.txt --ref data/test_IPA_text.txt
