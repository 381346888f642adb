#!/usr/bin/env python3
"""Convert a reference (eastonYi/OpenASR) PyTorch checkpoint into an
openasr-tpu package, so users of the reference can bring trained models.

Supported model types: conv-transformer, conv-ctc-transformer, conv-ctc
(the main speech families; reference: src/frameworks/Speech_Models.py
packages per-component `{name}_config` / `{name}_state` pairs,
Speech_Models.py:219-228,296-306,47-56).

Weight-layout translation (torch -> flax):
  * Linear weight [out, in]           -> kernel [in, out] (transpose)
  * Conv2d weight [O, I, H, W]        -> kernel [H, W, I, O]
  * MultiheadAttention in_proj_weight [3d, d] (packed q/k/v)
                                      -> q/k/v DenseGeneral kernels
                                         [d, nhead, head_dim]
  * out_proj weight [d, d]            -> out kernel [nhead, head_dim, d]
  * LayerNorm weight/bias             -> scale/bias
  * Embedding weight (tied to output_affine.weight in the reference,
    src/blocks/decoders.py:55)        -> emb.embedding (tie preserved:
                                         openasr-tpu attends through the
                                         embedding), output_affine.bias ->
                                         out_bias

Usage:
  python tools/convert_reference_pkg.py ref_last.pt out.pkg \
      --model_type conv-ctc-transformer

The output loads with `Model.create_model(configs); model.restore(pkg)` or
directly through `openasr_tpu.bin.infer --model_pkg out.pkg`.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _np(t):
    return t.detach().cpu().numpy().astype(np.float32)


def _linear(sd, prefix, bias=True):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _mha(sd, prefix, d_model, nhead):
    head_dim = d_model // nhead
    w = _np(sd[f"{prefix}.in_proj_weight"])   # [3d, d]
    b = _np(sd[f"{prefix}.in_proj_bias"])     # [3d]
    out = {}
    for i, name in enumerate(("q", "k", "v")):
        wi = w[i * d_model:(i + 1) * d_model]  # [d, d], y = wi @ x
        out[name] = {
            "kernel": wi.T.reshape(d_model, nhead, head_dim),
            "bias": b[i * d_model:(i + 1) * d_model].reshape(nhead, head_dim),
        }
    wo = _np(sd[f"{prefix}.out_proj.weight"])  # [d, d]
    out["out"] = {
        "kernel": wo.T.reshape(nhead, head_dim, d_model),
        "bias": _np(sd[f"{prefix}.out_proj.bias"]),
    }
    return out


def _conv2d(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{prefix}.bias"])}


def _ffn(sd, prefix):
    return {"linear1": _linear(sd, f"{prefix}.linear1"),
            "linear2": _linear(sd, f"{prefix}.linear2")}


def convert_encoder(sd: dict, cfg: dict) -> dict:
    d, h = int(cfg["d_model"]), int(cfg["nhead"])
    params = {}
    sub = cfg.get("sub") or {}
    if sub.get("type") in ("ConvV1", "ConvV2"):
        n = 2 if sub["type"] == "ConvV1" else int(sub.get("layer_num", 2))
        sep = "" if sub["type"] == "ConvV1" else "subsample/"
        # ConvV1 keys: sub.conv.0 / sub.conv.2 (Sequential indices);
        # ConvV2 keys: sub.conv.subsample/conv{i}
        conv_params = {}
        if sub["type"] == "ConvV1":
            for i, idx in enumerate((0, 2)):
                conv_params[f"conv{i}"] = _conv2d(sd, f"sub.conv.{idx}")
        else:
            for i in range(n):
                conv_params[f"conv{i}"] = _conv2d(sd, f"sub.conv.{sep}conv{i}")
        conv_params["affine"] = _linear(sd, "sub.affine")
        params["sub"] = conv_params
    elif sub.get("type") == "Stack":
        raise NotImplementedError(
            "reference Conv1dSubsample crashed on init "
            "(src/blocks/conv_layers.py:85-86); no trained checkpoints of "
            "this type can exist"
        )
    elif "affine.weight" in sd:
        params["affine"] = _linear(sd, "affine")
    for i in range(int(cfg["num_layers"])):
        p = f"transformer_encoder.layers.{i}"
        params[f"layer{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn", d, h),
            "ffn": _ffn(sd, p),
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
        }
    params["final_norm"] = _norm(sd, "transformer_encoder.norm")
    return params


def convert_decoder(sd: dict, cfg: dict) -> dict:
    d, h = int(cfg["d_model"]), int(cfg["nhead"])
    params = {
        "emb": {"embedding": _np(sd["emb.weight"])},
        "out_bias": _np(sd["output_affine.bias"]),
    }
    for i in range(int(cfg["num_layers"])):
        p = f"transformer_block.layers.{i}"
        params[f"layer{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn", d, h),
            "cross_attn": _mha(sd, f"{p}.multihead_attn", d, h),
            "ffn": _ffn(sd, p),
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
            "norm3": _norm(sd, f"{p}.norm3"),
        }
    return params


def convert(ref_pkg: dict, model_type: str) -> dict:
    """reference package dict -> openasr-tpu package dict."""
    sp_cfg = dict(ref_pkg.get("splayer_config") or {})
    en_cfg = dict(ref_pkg["encoder_config"])
    components = {
        "encoder": convert_encoder(ref_pkg["encoder_state"], en_cfg),
    }
    configs = {
        "type": model_type,
        "signal": sp_cfg,
        "encoder": en_cfg,
    }
    if model_type in ("conv-transformer", "conv-ctc-transformer"):
        de_cfg = dict(ref_pkg["decoder_config"])
        components["decoder"] = convert_decoder(
            ref_pkg["decoder_state"], de_cfg
        )
        configs["decoder"] = de_cfg
        configs["add_eos"] = True
        configs["add_blk"] = model_type == "conv-ctc-transformer"
    if model_type == "conv-ctc-transformer":
        components["ctc_fc"] = _linear(
            ref_pkg["ctc_fc_state"], "", bias=False
        ) if "ctc_fc_state.weight" in ref_pkg else {
            "kernel": _np(ref_pkg["ctc_fc_state"]["weight"]).T
        }
    if model_type == "conv-ctc":
        components["fc"] = {
            "kernel": _np(ref_pkg["fc_state"]["weight"]).T
        }
        configs["decoder"] = {
            "vocab_size": components["fc"]["kernel"].shape[1]
        }
        configs["add_blk"] = True
    return {
        "model_type": model_type,
        "configs": configs,
        "components": components,
    }


def main(argv=None):
    import torch

    from openasr_tpu.utils.checkpoint import save_package

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ref_pt", help="reference .pt package")
    parser.add_argument("out_pkg", help="output openasr-tpu .pkg")
    parser.add_argument("--model_type", required=True,
                        choices=("conv-transformer", "conv-ctc-transformer",
                                 "conv-ctc"))
    args = parser.parse_args(argv)

    ref = torch.load(args.ref_pt, map_location="cpu", weights_only=False)
    # solver checkpoints nest the model package under "model"
    if "model" in ref and "encoder_state" in ref["model"]:
        ref = ref["model"]
    pkg = convert(ref, args.model_type)
    save_package(pkg, args.out_pkg)
    n = sum(
        int(np.prod(x.shape))
        for comp in pkg["components"].values()
        for x in _tree_leaves(comp)
    )
    print(f"converted {args.ref_pt} -> {args.out_pkg} ({n/1e6:.2f}M params)")


def _tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
