#!/usr/bin/env python3
"""Build LibriSpeech json manifests from a corpus directory
(reference: egs/libri/gen_json.py). Thin wrapper over tools/gen_json.py
with LibriSpeech's transcript layout (<utt> <text> lines in
*.trans.txt files next to the flacs)."""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from openasr_tpu.data.audio import load_wave  # noqa: E402


def wave_duration(path: str) -> int:
    """valid sample count (the manifests' feat_length unit for wave input)"""
    _, data = load_wave(path)
    return int(len(data))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("corpus_dir", help="e.g. LibriSpeech/train-clean-100")
    p.add_argument("out_json")
    args = p.parse_args()

    samples = []
    for trans in glob.glob(
        os.path.join(args.corpus_dir, "**", "*.trans.txt"), recursive=True
    ):
        d = os.path.dirname(trans)
        for line in open(trans):
            utt, text = line.strip().split(" ", 1)
            path = os.path.join(d, utt + ".flac")
            if not os.path.exists(path):
                continue
            chars = " ".join("_" if c == " " else c for c in text.lower())
            # phones synthesized as char-spelled words joined by "|"
            # (reference: egs/libri/gen_json.py:55-70)
            phones = " | ".join(
                " ".join(word) for word in text.lower().split()
            )
            samples.append({
                "uttid": utt,
                "feat": path,
                "feat_length": wave_duration(path),
                "tokens": chars,
                "token_length": len(chars.split()),
                "phones": phones,
                "phone_length": len(phones.split()),
            })
    with open(args.out_json, "w") as f:
        json.dump(samples, f)
    print(f"{len(samples)} utts -> {args.out_json}")


if __name__ == "__main__":
    main()
