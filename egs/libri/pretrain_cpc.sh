#!/bin/bash
# (reference: egs/libri/pretrain_cpc.sh)
source path.sh
config=${1:-configs/pretrain_100h.yaml}
python -m openasr_tpu.bin.train_cpc --type pretrain $config
