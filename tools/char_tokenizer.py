#!/usr/bin/env python3
"""Text -> char/`[token]` tokenization (Chinese chars split, Latin words and
bracketed noise tokens kept whole).

Capability parity with reference: tools/char_tokenizer.py.
"""

import argparse
import re


def tokenize_line(trans: str) -> str:
    trans = trans.replace("[", " [").replace("]", "] ")
    tokens = []
    for token in trans.split():
        if re.findall("[a-zA-Z]", token):
            tokens.append(token)
        else:
            tokens.extend(list(token))
    return " ".join(tokens)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--text", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    with open(args.text, encoding="utf-8") as f, \
            open(args.output, "w", encoding="utf-8") as fw:
        for line in f:
            fields = line.strip().split(maxsplit=1)
            if len(fields) != 2:
                continue
            fw.write(f"{fields[0]} {tokenize_line(fields[1])}\n")


if __name__ == "__main__":
    main()
