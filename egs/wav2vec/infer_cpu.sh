#!/bin/bash
# CPU smoke decode for the wav2vec CTC recipe (capability parity: the
# reference's egs/wav2vec/infer_cpu.sh, which decoded a finetuned package
# over a wave-manifest json).
set -e
source path.sh
exp_dir=${1:-exp/wav2vec-test}
model_type=${2:-wav2vec_ctc}
export OPENASR_DEVICE=cpu JAX_PLATFORMS=cpu
python -m openasr_tpu.bin.infer \
    --model_type $model_type \
    --model_pkg $exp_dir/last.pkg \
    --vocab_path data/train_chars.txt \
    --json_file data/test_wav.json \
    --output $exp_dir/hyp.txt \
    --batch_frames 40000 \
    --nbest 2 \
    --maxlen 16 \
    --add_blk
python $MAIN_ROOT/tools/wer.py --hyp $exp_dir/hyp.txt --ref data/test_text.txt
bash $MAIN_ROOT/egs/eval_result.sh data/test_text.txt $exp_dir/hyp.txt $exp_dir/score.txt
