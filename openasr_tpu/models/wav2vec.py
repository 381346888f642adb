"""Wav2vec-style raw-waveform encoder with CTC finetuning.

Capability (re)build of the reference's wav2vec scaffolding, which was
non-functional: `src/blocks/wav2vec_encoder.py:91-149` referenced undefined
`task`/`w2v_args` and `src/fairseq_tools.py:4-8` was a docstring-only stub,
yet the capability — finetune a conv-frontend + transformer context network
on CTC with the frontend frozen for the first N updates
(`freeze_finetune_updates`, reference: src/blocks/wav2vec_encoder.py:123-149)
— is part of the surface (cf. egs/wav2vec/infer_cpu.sh).

Here it is functional end to end:
  * `Wav2VecEncoderModule`: WavConv (x160 downsample) -> projection ->
    positional encoding -> N transformer encoder layers (flash-attention on
    TPU via models/layers.py).
  * `Wav2VecCTC`: encoder -> CTC head; `freeze_finetune_updates` is
    implemented exactly — a step-counting optax gate zeroes frontend updates
    until the threshold (openasr_tpu/solvers/__init__.py freeze_until), not
    a static freeze.
  * Warm-starting from a CPC package reuses the WavConv weights
    (load_frontend), mirroring GRU_CTC.load_splayer
    (reference: Speech_Models.py:875-881).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import Framework, register_model
from openasr_tpu.models.frontend import WavConv
from openasr_tpu.models.layers import (
    LayerNorm,
    TransformerEncoderLayer,
    XAVIER_UNIFORM,
    positional_encoding,
)
from openasr_tpu.models.speech import target_lengths_of
from openasr_tpu.ops.ctc import cal_ctc_loss
from openasr_tpu.ops.ctc_decode import ctc_greedy_decode

Dtype = Any


class Wav2VecEncoderModule(nn.Module):
    """Raw wave [B, N] -> contextual features [B, N//160, d_model]."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int
    conv_dim: int = 512
    dropout_rate: float = 0.1
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, waves, wave_lengths, deterministic: bool = True):
        feats, lengths = WavConv(
            self.conv_dim, self.dtype, name="frontend"
        )(waves, wave_lengths, use_running_average=deterministic)
        x = nn.Dense(
            self.d_model, kernel_init=XAVIER_UNIFORM, dtype=self.dtype,
            name="proj",
        )(feats)
        x = positional_encoding(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout_rate, self.activation, self.dtype,
                name=f"layer{i}",
            )(x, None, deterministic, kv_lengths=lengths)
        x = LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return x, lengths


class Wav2VecCTCModule(nn.Module):
    encoder: Wav2VecEncoderModule
    vocab_size: int

    @nn.compact
    def __call__(self, waves, wave_lengths, deterministic: bool = True):
        enc, lengths = self.encoder(waves, wave_lengths, deterministic)
        logits = nn.Dense(
            self.vocab_size, use_bias=False, kernel_init=XAVIER_UNIFORM,
            name="fc",
        )(enc)
        return logits, lengths


@register_model("wav2vec_ctc")
class Wav2VecCTC(Framework):
    """CTC finetuning of the wav2vec-style encoder."""

    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        enc_cfg = configs.encoder
        module = Wav2VecCTCModule(
            encoder=Wav2VecEncoderModule(
                d_model=int(enc_cfg["d_model"]),
                nhead=int(enc_cfg["nhead"]),
                num_layers=int(enc_cfg["num_layers"]),
                dim_feedforward=int(enc_cfg["dim_feedforward"]),
                conv_dim=int(enc_cfg.get("conv_dim", 512)),
                dropout_rate=float(enc_cfg.get("dropout_rate", 0.1)),
                activation=enc_cfg.get("activation", "gelu"),
                dtype=dtype,
                name="encoder",
            ),
            vocab_size=int(configs.decoder["vocab_size"]),
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        waves = jnp.zeros((2, 3200), jnp.float32)
        lengths = jnp.array([3200, 1600], jnp.int32)
        variables = module.init(
            {"params": rng, "dropout": rng}, waves, lengths
        )
        model = cls(
            module, variables["params"], configs,
            batch_stats=variables.get("batch_stats"),
        )
        n_freeze = int(enc_cfg.get("freeze_finetune_updates", 0))
        if n_freeze > 0:
            # step-gated: the solver zeroes 'encoder' frontend updates for
            # the first n_freeze optimizer steps (see solvers.freeze_until)
            model.freeze_gate = (("encoder",), n_freeze)
        return model

    def loss(self, params, batch, rngs, train=True, batch_stats=None, **_):
        if batch_stats is None:
            batch_stats = self.batch_stats
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        tlen = target_lengths_of(batch["paddings"])
        if train:
            (logits, len_logits), updates = self.module.apply(
                variables, batch["waves"], batch["wave_lengths"],
                deterministic=False, rngs=rngs, mutable=["batch_stats"],
            )
        else:
            logits, len_logits = self.module.apply(
                variables, batch["waves"], batch["wave_lengths"],
                deterministic=True,
            )
            updates = None
        ctc = cal_ctc_loss(logits, len_logits, batch["labels"], tlen)
        out = {
            "ctc_loss": ctc,
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": jnp.asarray(batch["ids"].shape[0], jnp.float32),
        }
        if updates is not None:
            out["batch_stats"] = updates["batch_stats"]
        return out

    def get_logits(self, params, inputs, lengths):
        variables = {"params": params}
        if self.batch_stats is not None:
            variables["batch_stats"] = self.batch_stats
        return self.module.apply(variables, inputs, lengths)

    def greedy_decode(self, params, inputs, lengths):
        logits, len_logits = self.get_logits(params, inputs, lengths)
        return ctc_greedy_decode(logits, len_logits)

    def load_frontend(self, pkg: dict) -> None:
        """Warm-start the WavConv frontend from a CPC package
        (reference capability: Speech_Models.py:875-881)."""
        new_enc = dict(self.params["encoder"])
        new_enc["frontend"] = jax.tree_util.tree_map(
            jnp.asarray, pkg["components"]["splayer"]
        )
        new_params = dict(self.params)
        new_params["encoder"] = new_enc
        self.params = new_params
        if pkg.get("batch_stats") is not None and self.batch_stats:
            bs = dict(self.batch_stats)
            enc_bs = dict(bs.get("encoder", {}))
            enc_bs["frontend"] = jax.tree_util.tree_map(
                jnp.asarray, pkg["batch_stats"].get("splayer", {})
            )
            bs["encoder"] = enc_bs
            self.batch_stats = bs

    def fc_component_names(self):
        return ("fc",)


def load_fairseq_wav2vec(path: str):
    """Read a fairseq wav2vec checkpoint (torch .pt) and return its raw
    state dict (host-side numpy).  The reference's loader was an empty stub
    (reference: src/fairseq_tools.py:4-8).  Pair with
    `map_fairseq_context_network` to import the transformer context
    network into a Wav2VecCTC model."""
    import numpy as np
    import torch

    pkg = torch.load(path, map_location="cpu", weights_only=False)
    state = pkg.get("model", pkg)
    return {k: np.asarray(v) for k, v in state.items() if hasattr(v, "numpy")}


def map_fairseq_context_network(state: dict, encoder_params: dict,
                                nhead: int) -> dict:
    """Map fairseq wav2vec2 context-network weights onto a
    Wav2VecEncoderModule parameter tree.

    Covered (fairseq name -> ours):
      encoder.layers.N.self_attn.{q,k,v,out}_proj -> layerN.self_attn.{q,k,v,out}
      encoder.layers.N.self_attn_layer_norm       -> layerN.norm1
      encoder.layers.N.fc1 / fc2                  -> layerN.ffn.linear1/linear2
      encoder.layers.N.final_layer_norm           -> layerN.norm2
      encoder.layer_norm                          -> final_norm
      post_extract_proj                           -> proj
    (post-LN layout on both sides; fairseq's default layer_norm_first=False
    matches TransformerEncoderLayer's residual->LN ordering, and both use
    exact GeLU.)

    NOT mapped — structurally different by design: fairseq's 7-layer conv
    feature extractor (stride 320) vs the x160 WavConv frontend, and the
    relative-positional conv (`encoder.pos_conv`) vs sinusoidal positions.
    A KeyError/shape error means the checkpoint topology differs from the
    configured model; nothing is silently skipped for the covered names.

    Returns a NEW encoder params dict; leaves not covered keep their
    current values.
    """
    import numpy as np

    def t(x):
        return jnp.asarray(np.asarray(x))

    new = dict(encoder_params)

    if "post_extract_proj.weight" in state:
        new["proj"] = {
            "kernel": t(state["post_extract_proj.weight"]).T,
            "bias": t(state["post_extract_proj.bias"]),
        }
    if "encoder.layer_norm.weight" in state:
        new["final_norm"] = {
            "scale": t(state["encoder.layer_norm.weight"]),
            "bias": t(state["encoder.layer_norm.bias"]),
        }

    n = 0
    while f"encoder.layers.{n}.self_attn.q_proj.weight" in state:
        pre = f"encoder.layers.{n}"
        d = state[f"{pre}.self_attn.q_proj.weight"].shape[0]
        assert d % nhead == 0, (d, nhead)
        dh = d // nhead
        lp = dict(new[f"layer{n}"])

        def qkv(name):
            # torch Linear weight is [out, in]; our DenseGeneral kernel is
            # [in, H, dh] with heads split head-major from the out dim
            w = t(state[f"{pre}.self_attn.{name}_proj.weight"])
            b = t(state[f"{pre}.self_attn.{name}_proj.bias"])
            return {
                "kernel": w.T.reshape(d, nhead, dh),
                "bias": b.reshape(nhead, dh),
            }

        wo = t(state[f"{pre}.self_attn.out_proj.weight"])
        lp["self_attn"] = {
            "q": qkv("q"), "k": qkv("k"), "v": qkv("v"),
            "out": {
                "kernel": wo.T.reshape(nhead, dh, d),
                "bias": t(state[f"{pre}.self_attn.out_proj.bias"]),
            },
        }
        lp["norm1"] = {
            "scale": t(state[f"{pre}.self_attn_layer_norm.weight"]),
            "bias": t(state[f"{pre}.self_attn_layer_norm.bias"]),
        }
        lp["ffn"] = {
            "linear1": {
                "kernel": t(state[f"{pre}.fc1.weight"]).T,
                "bias": t(state[f"{pre}.fc1.bias"]),
            },
            "linear2": {
                "kernel": t(state[f"{pre}.fc2.weight"]).T,
                "bias": t(state[f"{pre}.fc2.bias"]),
            },
        }
        lp["norm2"] = {
            "scale": t(state[f"{pre}.final_layer_norm.weight"]),
            "bias": t(state[f"{pre}.final_layer_norm.bias"]),
        }
        new[f"layer{n}"] = lp
        n += 1
    if n == 0:
        raise ValueError(
            "no encoder.layers.N.self_attn.* entries found — not a "
            "fairseq wav2vec2 context-network state dict"
        )
    return new
