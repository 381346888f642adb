#!/bin/bash
# Average the last N epoch checkpoints.
source path.sh

exp_dir=${1:-exp/cif_mix}
num=${2:-10}

python $MAIN_ROOT/tools/avg_last_ckpts.py $exp_dir $num
