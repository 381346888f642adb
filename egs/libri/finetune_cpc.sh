#!/bin/bash
# (reference: egs/libri/finetune_cpc.sh)
source path.sh
config=${1:-configs/finetune_char.yaml}
python -m openasr_tpu.bin.train_cpc --type finetune $config
