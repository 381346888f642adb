from openasr_tpu.data.tokenizer import (  # noqa: F401
    BLK_SYM,
    EOS_ID,
    EOS_SYM,
    IGNORE_ID,
    SOS_ID,
    SOS_SYM,
    UNK_ID,
    UNK_SYM,
    CharTokenizer,
    SubwordTokenizer,
    build_tokenizer,
)
