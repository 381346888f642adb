#!/usr/bin/env python3
"""Walk a directory, write `path<TAB>num_samples` flist (CPC data prep).

Capability parity with reference: tools/gen_wav_flist.py (which required
soundfile; this uses the in-repo decoders).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openasr_tpu.data.audio import load_wave  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav-dir", dest="wav_dir", required=True)
    parser.add_argument("--ext", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    num = 0
    with open(args.output, "w") as fw:
        for root, _, files in os.walk(args.wav_dir):
            for fn in sorted(files):
                if fn.endswith(args.ext):
                    path = os.path.abspath(os.path.join(root, fn))
                    _, sig = load_wave(path)
                    fw.write(f"{path}\t{len(sig)}\n")
                    num += 1
    print(f"saved {num} samples")


if __name__ == "__main__":
    main()
