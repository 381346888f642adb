#!/usr/bin/env python3
"""Generate a tiny synthetic corpus for the egs/*/train_cpu.sh smoke paths.

The reference's `*_test.yaml` configs pointed at real mini subsets
(e.g. egs/aishell1/data/test_ark_small.json) that ship with the corpora;
no corpus exists in this environment, so the CPU smoke recipes build a
learnable synthetic one instead: features carry a simple per-token
activation pattern, labels correlate with it, phones are provided for the
CIF / phone2char recipes.

Outputs under --out:
  feats.ark/.scp, train.json, dev.json, test.json, chars.txt, phones.txt,
  test_text.txt (scoring reference), phones_unpaired.txt, text_unpaired.txt
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openasr_tpu.data import kaldi_io  # noqa: E402

CHARS = ["a", "b", "c", "d"]
PHONES = ["p1", "p2", "p3", "p4"]


def gen_wave_corpus(out: str, num_utts: int, seed: int) -> None:
    """Raw-waveform variant for the wav2vec recipe: small PCM16 wavs whose
    token identity is carried by per-segment tone frequency, plus
    train_wav/dev_wav/test_wav.json wave manifests (feat = wav path,
    feat_length = samples — the format egs/wav2vec/configs expects)."""
    from openasr_tpu.data.audio import write_wav

    rng = np.random.RandomState(seed)
    rate = 16000
    wav_dir = os.path.join(out, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    open(os.path.join(out, "train_chars.txt"), "w").write(
        "\n".join(CHARS) + "\n"
    )
    samples, text_lines = [], []
    seg = 1200  # samples per token segment
    gap = 240  # inter-token silence (15 ms): without it, adjacent
    # REPEATED tokens are one continuous sine — acoustically a single
    # long tone distinguishable only by duration, which makes them
    # systematically undecodable for CTC (measured: deletion-only CER
    # exactly at the repeated-token positions).  Real speech separates
    # repeats with articulation transitions; the gap models that.
    for i in range(num_utts):
        n_tok = rng.randint(2, 5)
        toks = rng.randint(0, len(CHARS), size=n_tok)
        n = (seg + gap) * n_tok + rng.randint(0, seg // 2)
        t_axis = np.arange(n) / rate
        wave = 60.0 * rng.randn(n)
        for j, tok in enumerate(toks):
            f0 = 300.0 + 200.0 * tok
            sl = slice(j * (seg + gap), j * (seg + gap) + seg)
            wave[sl] += 4000.0 * np.sin(2 * np.pi * f0 * t_axis[sl])
        key = f"utt{i:03d}"
        path = os.path.join(wav_dir, key + ".wav")
        write_wav(path, rate, wave)
        tokens = " ".join(CHARS[k] for k in toks)
        samples.append({
            "uttid": key, "feat": path, "feat_length": int(n),
            "tokens": tokens, "token_length": int(n_tok),
        })
        text_lines.append(f"{key} {tokens}")

    def dump(name, subset):
        with open(os.path.join(out, name), "w") as f:
            json.dump(subset, f)

    n_small = max(num_utts // 2, 2)
    dump("train_wav.json", samples)
    dump("dev_wav.json", samples[:n_small])
    dump("test_wav.json", samples[:n_small])
    open(os.path.join(out, "test_text.txt"), "w").write(
        "\n".join(text_lines[:n_small]) + "\n"
    )
    print(f"mini wave corpus: {num_utts} utts -> {out}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--num_utts", type=int, default=16)
    parser.add_argument("--feat_dim", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--wave", action="store_true",
        help="emit raw-waveform wavs + wave manifests (wav2vec recipes)",
    )
    args = parser.parse_args(argv)
    if args.wave:
        os.makedirs(args.out, exist_ok=True)
        gen_wave_corpus(args.out, args.num_utts, args.seed)
        return

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    (lambda p, t: open(p, "w").write(t))(
        os.path.join(args.out, "chars.txt"), "\n".join(CHARS) + "\n"
    )
    open(os.path.join(args.out, "phones.txt"), "w").write(
        "\n".join(PHONES) + "\n"
    )

    mats, samples, text_lines = [], [], []
    for i in range(args.num_utts):
        n_tok = rng.randint(2, 5)
        toks = rng.randint(0, len(CHARS), size=n_tok)
        t = 24 + 8 * n_tok + rng.randint(0, 8)
        feat = rng.randn(t, args.feat_dim).astype(np.float32) * 0.1
        for j, tok in enumerate(toks):
            feat[j * 8 : j * 8 + 8, tok * 4 : tok * 4 + 4] += 1.0
        key = f"utt{i:03d}"
        mats.append((key, feat))
        tokens = " ".join(CHARS[k] for k in toks)
        phones = " ".join(PHONES[k] for k in toks)
        samples.append({
            "uttid": key,
            "feat_length": int(t),
            "tokens": tokens,
            "token_length": int(n_tok),
            "phones": phones,
            "phone_length": int(n_tok),
        })
        text_lines.append(f"{key} {tokens}")

    prefix = os.path.join(args.out, "feats")
    kaldi_io.write_ark_scp(prefix, mats)
    scp = dict(
        line.strip().split(" ", 1) for line in open(prefix + ".scp")
    )
    for s in samples:
        s["feat"] = scp[s["uttid"]]

    def dump(name, subset):
        with open(os.path.join(args.out, name), "w") as f:
            json.dump(subset, f)

    dump("train.json", samples)
    dump("dev.json", samples[: max(args.num_utts // 2, 2)])
    dump("test.json", samples[: max(args.num_utts // 2, 2)])
    open(os.path.join(args.out, "test_text.txt"), "w").write(
        "\n".join(text_lines[: max(args.num_utts // 2, 2)]) + "\n"
    )
    open(os.path.join(args.out, "phones_unpaired.txt"), "w").write(
        "\n".join(f"{s['uttid']} {s['phones']}" for s in samples) + "\n"
    )
    open(os.path.join(args.out, "text_unpaired.txt"), "w").write(
        "\n".join(f"{s['uttid']} {s['tokens']}" for s in samples) + "\n"
    )
    print(f"mini corpus: {args.num_utts} utts -> {args.out}")


if __name__ == "__main__":
    main()
