"""phone->char decoding CLI with inline WER.

Capability parity with reference: src/infer_phone2char.py:29-151 —
attention beam search (Embed_Decoder) or CTC greedy (Embed_Decoder_CTC),
writes hyp.txt/ref.txt and reports WER inline.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from openasr_tpu.bin.train import setup_logging
from openasr_tpu.config import Config
from openasr_tpu.data.collate import PhoneCharCollate
from openasr_tpu.data.loader import DataLoader
from openasr_tpu.data.manifest import PhoneCharDataset
from openasr_tpu.data.sampler import BudgetBatchSampler
from openasr_tpu.data.tokenizer import CharTokenizer
from openasr_tpu.models import get_model_class
from openasr_tpu.utils.checkpoint import load_package
from openasr_tpu.utils.metrics import wer


def main(argv=None):
    from openasr_tpu.utils import (
        configure_compile_cache,
        pin_default_device,
    )
    pin_default_device()
    configure_compile_cache()
    setup_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_type", required=True)
    parser.add_argument("--model_pkg", required=True)
    parser.add_argument("--vocab_phone", required=True)
    parser.add_argument("--vocab_char", required=True)
    parser.add_argument("--json_file", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--batch_phones", type=int, default=500)
    parser.add_argument("--nbest", type=int, default=5)
    parser.add_argument("--maxlen", type=int, default=80)
    parser.add_argument("--add_blk", action="store_true", default=False)
    args = parser.parse_args(argv)

    tokenizer_phone = CharTokenizer(args.vocab_phone)
    tokenizer_char = CharTokenizer(args.vocab_char, add_blk=args.add_blk)

    pkg = load_package(args.model_pkg)
    model_pkg = pkg["model"] if "model" in pkg else pkg
    configs = Config(model_pkg["configs"])
    model = get_model_class(args.model_type).create_model(configs)
    model.restore(model_pkg)

    test_set = PhoneCharDataset(args.json_file, feat_range=(1, 10**9),
                                label_range=(0, 10**9), rate_in_out=(0, 10**9))
    collate = PhoneCharCollate(tokenizer_phone, tokenizer_char, add_eos=True)
    loader = DataLoader(
        test_set,
        BudgetBatchSampler(test_set, args.batch_phones, key="phone_length"),
        collate, num_workers=2,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    hyp_path = os.path.join(args.output_dir, "hyp.txt")
    ref_path = os.path.join(args.output_dir, "ref.txt")
    all_hyps, all_refs = [], []

    is_ctc = args.model_type == "Embed_Decoder_CTC"
    with open(hyp_path, "w") as fh, open(ref_path, "w") as fr:
        for batch in loader:
            if is_ctc:
                ids, lens = model.greedy_decode(
                    model.params, batch["phones"], batch["phone_lengths"]
                )
                ids, lens = np.asarray(ids), np.asarray(lens)
            else:
                preds, plens, _ = model.batch_beam_decode(
                    model.params, batch["phones"], batch["phone_lengths"],
                    beam_size=args.nbest, max_decode_len=args.maxlen,
                )
                ids = np.asarray(preds)[:, 0]
                lens = np.asarray(plens)[:, 0]
            labels = np.asarray(batch["labels"])
            tlen = (1 - np.asarray(batch["paddings"])).sum(-1).astype(int)
            for i, utt in enumerate(batch["uttids"]):
                hyp_toks = [int(x) for x in ids[i, : lens[i]]]
                ref_toks = [int(x) for x in labels[i, : tlen[i]]]
                hyp = tokenizer_char.decode(hyp_toks)
                ref = tokenizer_char.decode(ref_toks)
                fh.write(f"{utt} {hyp}\n")
                fr.write(f"{utt} {ref}\n")
                all_hyps.append(hyp.split())
                all_refs.append(ref.split())

    stats = wer(all_refs, all_hyps)
    logging.info(
        "WER %.2f%% (sub %.2f del %.2f ins %.2f) over %d ref tokens",
        stats["wer"], stats["sub"], stats["del"], stats["ins"], stats["n_ref"],
    )
    print(f"WER: {stats['wer']:.2f}")


if __name__ == "__main__":
    main()
