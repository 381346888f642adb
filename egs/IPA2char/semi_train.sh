#!/bin/bash
source path.sh
config=$1
python -m openasr_tpu.bin.semi_train_phone2char $config
