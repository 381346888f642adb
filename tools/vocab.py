#!/usr/bin/env python3
"""Frequency-sorted vocabulary builder from `uttid tokens...` text.

Capability parity with reference: tools/vocab.py:13-33 (skips tokens
containing ASCII alphanumerics, e.g. English words mixed into Chinese
transcripts, as the reference did).
"""

import argparse
import re
from collections import Counter


def make_vocab(fpath, fname, skip_alnum=True):
    counter = Counter()
    with open(fpath, encoding="utf-8") as f:
        for line in f:
            counter.update(line.strip().split()[1:])
    kept = 0
    with open(fname, "w", encoding="utf-8") as fw:
        for word, cnt in counter.most_common():
            if skip_alnum and re.findall("[0-9a-zA-Z]", word):
                continue
            fw.write(f"{word} {cnt}\n")
            kept += 1
    print(f"Vocab path: {fname}\tsize: {kept}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--text", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--keep-alnum", action="store_true")
    args = parser.parse_args()
    make_vocab(args.text, args.output, skip_alnum=not args.keep_alnum)
