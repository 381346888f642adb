#!/bin/bash
# Usage: ./train.sh configs/conv-ctc-transformer.yaml
source path.sh

config=$1

python -m openasr_tpu.bin.train $config
# python -m openasr_tpu.bin.train --continue-training $config
