#!/bin/bash
source path.sh
exp_dir=${1:-exp/pinyin2char}
pkg=${2:-last.pkg}
python -m openasr_tpu.bin.infer_phone2char \
    --model_type Embed_Decoder_CTC \
    --model_pkg $exp_dir/$pkg \
    --vocab_phone data/phones.txt \
    --vocab_char data/chars.txt \
    --json_file data/test.json \
    --output_dir $exp_dir/decode_test \
    --add_blk
