#!/usr/bin/env python3
"""Convert a checkpoint package between the per-layer encoder layout
('layer{i}' children — the default, reference-compatible layout) and the
stacked layout ('stack/stacked_layers' with leading-[L] leaves) that
`encoder.pipeline: true` / GPipe pipeline parallelism consumes
(openasr_tpu/parallel/pipeline.py).

Usage:
  python tools/stack_encoder_pkg.py in.pkg out.pkg            # stack
  python tools/stack_encoder_pkg.py in.pkg out.pkg --unstack  # inverse
  ... --component encoder   (default; repeatable for e.g. G.encoder)

The optimizer state is dropped (its moment trees mirror the old param
layout); resuming from a converted package starts a fresh optimizer,
exactly like the reference's warm-start path (src/train.py:74-86).
"""

import argparse
import sys

import numpy as np
import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from openasr_tpu.parallel.pipeline import (  # noqa: E402
    stack_layer_params,
    unstack_layer_params,
)
from openasr_tpu.utils.checkpoint import load_package, save_package  # noqa: E402


def _get_component(tree: dict, dotted: str):
    node = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def _set_component(tree: dict, dotted: str, value) -> None:
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def convert_encoder(enc: dict, unstack: bool) -> dict:
    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
    if unstack:
        if "stack" not in enc or "stacked_layers" not in enc["stack"]:
            raise SystemExit("package has no stacked layer group to unstack")
        stacked = enc["stack"]["stacked_layers"]
        n = len(jax.tree_util.tree_leaves(stacked)) and int(
            jax.tree_util.tree_leaves(stacked)[0].shape[0]
        )
        out = {k: v for k, v in enc.items() if k != "stack"}
        out.update(to_np(unstack_layer_params(stacked, n)))
        return out
    stacked, n = stack_layer_params(enc)
    out = {
        k: v for k, v in enc.items()
        if not (k.startswith("layer") and k[5:].isdigit())
    }
    out["stack"] = {"stacked_layers": to_np(stacked)}
    print(f"stacked {n} layers")
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--unstack", action="store_true")
    ap.add_argument("--component", action="append", default=None,
                    help="dotted component path(s), default: encoder")
    args = ap.parse_args(argv)

    pkg = load_package(args.input)
    components = pkg["model"]["components"]
    for comp in args.component or ["encoder"]:
        enc = _get_component(components, comp)
        _set_component(
            components, comp, convert_encoder(enc, args.unstack)
        )
    if pkg.get("optim_state") is not None:
        print("note: optimizer state dropped (layout changed); resume "
              "starts a fresh optimizer")
        pkg["optim_state"] = None
    save_package(pkg, args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
