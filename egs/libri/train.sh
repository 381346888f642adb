#!/bin/bash
# Supervised training entry (reference: egs/libri/train.sh)
source path.sh
config=$1
python -m openasr_tpu.bin.train $config
