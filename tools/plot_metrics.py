#!/usr/bin/env python3
"""Summarize an experiment's metrics.jsonl on the terminal.

The rebuild's replacement for the reference's removed tensorboardX plots
(reference: src/utils.py:14 TENSORBOARD_LOGGING stub): per-epoch tr/cv loss
table plus a sparkline of the training-loss trajectory.

Usage: python tools/plot_metrics.py <exp_dir or metrics.jsonl>
"""

from __future__ import annotations

import json
import os
import sys

BARS = "▁▂▃▄▅▆▇█"


def sparkline(values):
    if not values:
        return ""
    lo, hi = min(values), max(values)
    rng = (hi - lo) or 1.0
    return "".join(BARS[int((v - lo) / rng * (len(BARS) - 1))] for v in values)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    path = argv[0]
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    records = [json.loads(l) for l in open(path) if l.strip()]

    train = [r for r in records if r.get("phase") == "train"]
    epochs = [r for r in records if r.get("phase") == "epoch"]

    loss_keys = sorted(
        k for r in train for k in r if k.endswith("_loss")
    )
    if train:
        print(f"train intervals: {len(train)}")
        for k in dict.fromkeys(loss_keys):
            vals = [r[k] for r in train if k in r]
            print(f"  {k:<14} {sparkline(vals)}  last={vals[-1]:.4f}")
        sps = [r["sent_per_sec"] for r in train if "sent_per_sec" in r]
        if sps:
            print(f"  {'sent/sec':<14} {sparkline(sps)}  last={sps[-1]:.2f}")
    if epochs:
        print(f"{'epoch':>5} {'tr_loss':>10} {'cv_loss':>10} {'best_cv':>10} "
              f"{'min':>6}")
        for r in epochs:
            print(f"{r['epoch']:>5} {r['tr_loss']:>10.4f} "
                  f"{r['cv_loss']:>10.4f} {r['best_cv']:>10.4f} "
                  f"{r.get('minutes', 0):>6.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
