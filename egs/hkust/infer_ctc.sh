#!/bin/bash
# CTC prefix-beam decode, on device by default (144x the host C++
# path, ops/ctc_beam_device.py; drop --ctc_beam_device for the
# native host decoder).  Reference: egs/hkust/infer_ctc.sh
set -e
source path.sh
exp_dir=${1:-exp/ctc}
pkg=${2:-avg10.pkg}
python -m openasr_tpu.bin.infer \
    --model_type conv-ctc \
    --model_pkg $exp_dir/$pkg \
    --vocab_path data/vocab.char \
    --json_file data/test.json \
    --output $exp_dir/decode_test/hyp.txt \
    --batch_frames 8000 \
    --ctc_beam 10 \
    --ctc_beam_device \
    --offline \
    --add_blk
python $MAIN_ROOT/tools/wer.py --cer \
    --hyp $exp_dir/decode_test/hyp.txt \
    --ref data/test_text.txt
