#!/bin/bash
# Usage: ./train.sh configs/wav2vec_ctc.yaml
source path.sh

config=$1

python -m openasr_tpu.bin.train $config
