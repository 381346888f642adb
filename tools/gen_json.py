#!/usr/bin/env python3
"""Build a training json manifest from Kaldi-style files.

Capability parity with reference: tools/gen_json.py:57-79 — fields
uttid/feat/feat_length/tokens/token_length/[phones/phone_length]/trans.
"""

import argparse
import json


def read_kv(path, value_fn=str):
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            fields = line.strip().split(maxsplit=1)
            if len(fields) == 2:
                out[fields[0]] = value_fn(fields[1])
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--feat", required=True, help="feats.scp")
    parser.add_argument("--num_frames", required=True, help="utt2num_frames")
    parser.add_argument("--trans", required=True, help="text")
    parser.add_argument("--tokens", default=None)
    parser.add_argument("--phones", default=None)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    uttid2feat = read_kv(args.feat)
    uttid2num = read_kv(args.num_frames, int)
    uttid2trans = read_kv(args.trans)
    uttid2tokens = read_kv(args.tokens) if args.tokens else None
    uttid2phones = read_kv(args.phones) if args.phones else None

    samples, total = [], 0
    for uttid, feat in uttid2feat.items():
        total += 1
        try:
            sample = {
                "uttid": uttid,
                "feat": feat,
                "feat_length": uttid2num[uttid],
                "trans": uttid2trans[uttid],
            }
            if uttid2tokens is not None:
                sample["tokens"] = uttid2tokens[uttid]
                sample["token_length"] = len(sample["tokens"].split())
            else:
                sample["tokens"] = " ".join(uttid2trans[uttid])
                sample["token_length"] = len(sample["tokens"].split())
            if uttid2phones is not None:
                sample["phones"] = uttid2phones[uttid]
                sample["phone_length"] = len(sample["phones"].split())
        except KeyError:
            print("skip", uttid)
            continue
        samples.append(sample)

    print(f"saved {len(samples)}/{total} samples")
    with open(args.output, "w", encoding="utf-8") as fw:
        fw.write(json.dumps(samples, indent=2, ensure_ascii=False))


if __name__ == "__main__":
    main()
