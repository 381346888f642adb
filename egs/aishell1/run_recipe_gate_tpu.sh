#!/bin/bash
# Recipe-path CER gate (round-5 directive #5): drive the SAME scripts a
# production run uses — corpus/vocab prep -> train CLI -> infer CLI ->
# tools/wer.py — end to end on the accelerator with every shipped
# production feature ON (online fused-fbank frontend, SpecAug, bf16
# compute, bucketed shapes, ZeRO-1, nonfinite-skip; bf16 decode with
# the ON-DEVICE CTC prefix beam), gated on the full stack scoring
# CER == 0 on its training distribution.  The committed real AISHELL-1
# utterance additionally runs through the identical trained pipeline as
# an unscored decode smoke (real 16 kHz speech through the same L0
# path).  See configs/conv-ctc-recipe-gate.yaml for why the scored
# corpus is the generator's, not the single real utterance.
#
# Usage: cd egs/aishell1 && bash run_recipe_gate_tpu.sh
# Writes exp/recipe_gate/RESULT.json with the scored CER.
set -e
source path.sh

config=configs/conv-ctc-recipe-gate.yaml
exp_dir=exp/recipe_gate

# --- L6: corpus + vocab prep (the committed generator)
if [ ! -f data/gate/train_wav.json ]; then
    python $MAIN_ROOT/tools/gen_mini_corpus.py --out data/gate --wave \
        --num_utts 256
    python - <<'PYEOF'
import json
# small dev set: the per-epoch dev pass through the tunnel is pure
# overhead for the gate (the scored decode runs on test_wav below)
rows = json.load(open("data/gate/dev_wav.json"))
json.dump(rows[:8], open("data/gate/dev_wav.json", "w"))
# repeat the train rows so each epoch carries real step counts instead
# of paying the per-epoch host overhead every handful of steps
tr = json.load(open("data/gate/train_wav.json"))
out = []
for rep in range(32):
    for r in tr:
        q = dict(r)
        q["uttid"] = f"{r['uttid']}_r{rep}"
        out.append(q)
json.dump(out, open("data/gate/train_wav.json", "w"))
PYEOF
fi

# --- train (the train.sh path)
python -m openasr_tpu.bin.train $config

# --- decode the held-in test set (the infer.sh path: bf16 + device beam)
python -m openasr_tpu.bin.infer \
    --model_type conv-ctc \
    --model_pkg $exp_dir/last.pkg \
    --vocab_path data/gate/train_chars.txt \
    --json_file data/gate/test_wav.json \
    --output $exp_dir/decode_gate/hyp.txt \
    --batch_frames 1000000 \
    --ctc_beam 4 --ctc_beam_device \
    --add_blk --split_token \
    --dtype bfloat16

# --- score (the tools/wer.py path) and gate on CER == 0
python $MAIN_ROOT/tools/wer.py --cer \
    --hyp $exp_dir/decode_gate/hyp.txt \
    --ref data/gate/test_text.txt | tee $exp_dir/decode_gate/score.txt

# --- real-audio decode smoke: the committed real AISHELL-1 utterance
# through the SAME trained pipeline (unscored: its transcript is not in
# this corpus; the point is the L0 path on real speech end to end)
python - <<'PYEOF'
import json
import os
import sys

sys.path.insert(0, os.environ["MAIN_ROOT"])
from openasr_tpu.data.audio import load_wave

wav = os.path.join(os.environ["MAIN_ROOT"], "tests/data/BAC009S0764W0121.wav")
sr, x = load_wave(wav)
assert sr == 16000, sr
with open("data/gate/real_smoke.json", "w") as f:
    json.dump([{"uttid": "BAC009S0764W0121", "feat": wav,
                "feat_length": int(x.shape[0]), "tokens": "a",
                "token_length": 1}], f)
PYEOF
python -m openasr_tpu.bin.infer \
    --model_type conv-ctc \
    --model_pkg $exp_dir/last.pkg \
    --vocab_path data/gate/train_chars.txt \
    --json_file data/gate/real_smoke.json \
    --output $exp_dir/decode_gate/real_smoke_hyp.txt \
    --batch_frames 1000000 \
    --ctc_beam 4 --ctc_beam_device \
    --add_blk --split_token \
    --dtype bfloat16

python - <<'PYEOF'
import json
import re

score = open("exp/recipe_gate/decode_gate/score.txt").read()
m = re.search(r"(?:CER|WER)[^\d]*([\d.]+)", score)
assert m, f"no CER in scorer output:\n{score}"
cer = float(m.group(1))
smoke = open("exp/recipe_gate/decode_gate/real_smoke_hyp.txt").read().strip()
result = {
    "gate": "recipe_path_cer",
    "cer": cer,
    "corpus": "tools/gen_mini_corpus.py --wave (16 kHz PCM, 256 utts)",
    "stack": "train CLI (online fused fbank + SpecAug + bf16 + ZeRO-1 + "
             "skip_nonfinite + bucketing) -> infer CLI (bf16, on-device "
             "CTC prefix beam) -> tools/wer.py",
    "real_audio_smoke": smoke,
}
with open("exp/recipe_gate/RESULT.json", "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result))
assert cer == 0.0, f"recipe-path gate FAILED: CER {cer} != 0"
print("recipe-path CER gate PASSED: CER 0.0 through the full stack")
PYEOF
