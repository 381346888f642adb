#!/bin/bash
# CPU smoke decode + scoring (capability parity: reference infer_cpu.sh).
set -e
source path.sh
exp_dir=${1:-exp/ctc-test}
model_type=${2:-conv-ctc}
export OPENASR_DEVICE=cpu JAX_PLATFORMS=cpu
python -m openasr_tpu.bin.infer \
    --model_type $model_type \
    --model_pkg $exp_dir/last.pkg \
    --vocab_path data/chars.txt \
    --json_file data/test.json \
    --output $exp_dir/hyp.txt \
    --batch_frames 2000 \
    --nbest 2 \
    --maxlen 16 \
    --offline \
    --add_blk
python $MAIN_ROOT/tools/wer.py --hyp $exp_dir/hyp.txt --ref data/test_text.txt
bash $MAIN_ROOT/egs/eval_result.sh data/test_text.txt $exp_dir/hyp.txt $exp_dir/score.txt
