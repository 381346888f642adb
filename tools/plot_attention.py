#!/usr/bin/env python3
"""Dump attention-map heatmaps for one batch of a manifest.

The rebuild's counterpart to the reference's attention visualizations
(vendored transformer `return_atten`, third_party/transformer.py:161-189 +
the TensorBoard images advertised in its README_zh): loads a checkpoint
package, decodes nothing — just runs a deterministic forward with
`Framework.attention_maps` and writes one PNG heatmap per captured
attention site (encoder self / decoder self / decoder cross), or raw .npz
when matplotlib is unavailable.

Usage:
  python tools/plot_attention.py --model_type conv-ctc-transformer \
      --model_pkg exp/.../last.pkg --vocab_path data/chars.txt \
      --json_file data/test.json --output_dir /tmp/atten [--utts 4]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openasr_tpu.config import Config  # noqa: E402
from openasr_tpu.data.collate import FeatureCollate, WaveCollate  # noqa: E402
from openasr_tpu.data.manifest import ArkDataset, SpeechDataset  # noqa: E402
from openasr_tpu.data.tokenizer import CharTokenizer  # noqa: E402
from openasr_tpu.models import get_model_class  # noqa: E402
from openasr_tpu.utils.checkpoint import load_package  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_type", required=True)
    ap.add_argument("--model_pkg", required=True)
    ap.add_argument("--vocab_path", required=True)
    ap.add_argument("--json_file", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--utts", type=int, default=4)
    ap.add_argument("--offline", action="store_true")
    ap.add_argument("--add_blk", action="store_true")
    ap.add_argument("--average_heads", action="store_true")
    args = ap.parse_args(argv)

    pkg = load_package(args.model_pkg)
    model_pkg = pkg["model"] if "model" in pkg else pkg
    tok = CharTokenizer(args.vocab_path, add_blk=args.add_blk)
    configs = Config(model_pkg["configs"])
    configs.decoder["vocab_size"] = tok.unit_num()
    if configs.signal and "spec_aug" in configs.signal:
        del configs.signal["spec_aug"]  # deterministic forward
    model = get_model_class(args.model_type).create_model(configs)
    model.restore(model_pkg)
    signal_cfg = model.configs.signal
    offline = args.offline or not signal_cfg or (
        signal_cfg.get("feature_type", "offline") == "offline"
    )
    if offline:
        ds = ArkDataset(args.json_file)
        col = FeatureCollate(tok, add_eos=True)
    else:
        ds = SpeechDataset(args.json_file)
        col = WaveCollate(tok, add_eos=True)
    batch = col([ds[i] for i in range(min(args.utts, len(ds)))])

    maps = model.attention_maps(batch, average_heads=args.average_heads)
    os.makedirs(args.output_dir, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        plt = None

    for name, arr in maps.items():
        arr = np.asarray(arr, np.float32)
        safe = name.replace("/", "_")
        if plt is None:
            np.savez(os.path.join(args.output_dir, f"{safe}.npz"), attn=arr)
            continue
        # [B, H, Tq, Tk] or [B, Tq, Tk]: plot utterance 0, head 0/mean
        a = arr[0] if arr.ndim == 3 else arr[0, 0]
        fig, ax = plt.subplots(figsize=(6, 4), dpi=120)
        im = ax.imshow(a, aspect="auto", origin="lower",
                       interpolation="nearest")
        ax.set_xlabel("key position")
        ax.set_ylabel("query position")
        ax.set_title(name)
        fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(os.path.join(args.output_dir, f"{safe}.png"))
        plt.close(fig)
    print(f"wrote {len(maps)} attention maps -> {args.output_dir}")


if __name__ == "__main__":
    main()
