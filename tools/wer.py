#!/usr/bin/env python3
"""WER/CER scorer over `utt hyp...` / `utt ref...` files.

Capability parity with reference: egs/wer.py (267 LoC DP scorer with
sub/del/ins breakdown, Chinese character splitting, ignore list).
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openasr_tpu.utils.metrics import wer  # noqa: E402


def split_chars(text: str, char_level: bool) -> list:
    """Token split; with --cer, CJK strings split to chars while Latin
    words stay whole (the reference's Chinese handling)."""
    tokens = []
    for tok in text.split():
        if char_level and not re.findall("[a-zA-Z0-9]", tok):
            tokens.extend(list(tok))
        else:
            tokens.append(tok)
    return tokens


def read_trn(path: str, char_level: bool, ignore: set) -> dict:
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            fields = line.strip().split(maxsplit=1)
            if not fields:
                continue
            utt = fields[0]
            text = fields[1] if len(fields) > 1 else ""
            toks = [t for t in split_chars(text, char_level)
                    if t not in ignore]
            out[utt] = toks
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--hyp", required=True)
    parser.add_argument("--ref", required=True)
    parser.add_argument("--cer", action="store_true",
                        help="character-level (CJK-aware) scoring")
    parser.add_argument("--ignore", default="",
                        help="comma-separated tokens to ignore")
    args = parser.parse_args()

    ignore = set(t for t in args.ignore.split(",") if t)
    hyps = read_trn(args.hyp, args.cer, ignore)
    refs = read_trn(args.ref, args.cer, ignore)

    common = [u for u in refs if u in hyps]
    missing = len(refs) - len(common)
    if missing:
        print(f"WARNING: {missing} reference utts missing from hyp")

    stats = wer([refs[u] for u in common], [hyps[u] for u in common])
    name = "CER" if args.cer else "WER"
    print(
        f"{name} {stats['wer']:.2f} | Sub {stats['sub']:.2f} "
        f"Del {stats['del']:.2f} Ins {stats['ins']:.2f} | "
        f"{len(common)} snt / {stats['n_ref']} wrd"
    )


if __name__ == "__main__":
    main()
