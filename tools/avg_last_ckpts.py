#!/usr/bin/env python3
"""Average the last N epoch checkpoints -> avgN.pkg.

Capability parity with reference: tools/avg_last_ckpts.py:35-55.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openasr_tpu.utils.checkpoint import average_last_ckpts  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("exp_dir")
    parser.add_argument("num", type=int)
    args = parser.parse_args()
    out = os.path.join(args.exp_dir, f"avg{args.num}.pkg")
    average_last_ckpts(args.exp_dir, args.num, out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
