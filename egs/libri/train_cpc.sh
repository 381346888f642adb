#!/bin/bash
source path.sh
config=$1
python -m openasr_tpu.bin.train_cpc --type pretrain $config
