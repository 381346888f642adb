"""Encoders: Transformer (with conv subsampling) and GRU.

Capability parity with reference: src/blocks/encoders.py:26-114.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.models.layers import (
    XAVIER_UNIFORM,
    LayerNorm,
    TransformerEncoderLayer,
    positional_encoding,
)
from openasr_tpu.models.subsample import (
    Conv1dSubsample,
    Conv2dSubsample,
    Conv2dSubsampleV2,
)

Dtype = Any


class TransformerEncoder(nn.Module):
    """Conv subsampling -> scaled PE + dropout -> N post-LN layers -> final
    LayerNorm (reference: src/blocks/encoders.py:26-80; the final norm
    mirrors the reference's `encoder_norm`)."""

    input_dim: int
    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    sub_type: Optional[str] = None  # ConvV1 | ConvV2 | Stack | None
    sub_layer_num: int = 2
    context_width: int = 3
    subsample: int = 1
    remat: bool = False  # jax.checkpoint each layer: trade FLOPs for HBM
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        deterministic: bool = True,
    ):
        feats = feats.astype(self.dtype)
        if self.sub_type == "ConvV1":
            x, lengths = Conv2dSubsample(
                self.input_dim, self.d_model, self.dtype, name="sub"
            )(feats, feat_lengths)
        elif self.sub_type == "ConvV2":
            x, lengths = Conv2dSubsampleV2(
                self.input_dim, self.d_model, self.sub_layer_num, self.dtype,
                name="sub",
            )(feats, feat_lengths)
        elif self.sub_type == "Stack":
            x, lengths = Conv1dSubsample(
                self.input_dim, self.d_model, self.context_width,
                self.subsample, self.dtype, name="sub",
            )(feats, feat_lengths)
        elif self.input_dim == self.d_model:
            x, lengths = feats, feat_lengths
        else:
            x = nn.Dense(
                self.d_model, kernel_init=XAVIER_UNIFORM, dtype=self.dtype,
                name="affine",
            )(feats)
            lengths = feat_lengths

        x = positional_encoding(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

        layer_cls = (
            nn.remat(TransformerEncoderLayer, static_argnums=(3, 5))
            if self.remat
            else TransformerEncoderLayer
        )
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout_rate, self.activation, self.dtype,
                name=f"layer{i}",
            )(x, None, deterministic, lengths, False)
        x = LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return x, lengths

    @staticmethod
    def from_config(cfg, dtype=jnp.float32) -> "TransformerEncoder":
        sub = cfg.get("sub") or {}
        return TransformerEncoder(
            input_dim=int(cfg["input_dim"]),
            d_model=int(cfg["d_model"]),
            nhead=int(cfg["nhead"]),
            dim_feedforward=int(cfg["dim_feedforward"]),
            num_layers=int(cfg["num_layers"]),
            dropout_rate=float(cfg.get("dropout_rate", 0.1)),
            activation=cfg.get("activation", "relu"),
            sub_type=sub.get("type"),
            sub_layer_num=int(sub.get("layer_num", 2)),
            context_width=int(cfg.get("context_width", 3)),
            subsample=int(cfg.get("subsample", 1)),
            remat=bool(cfg.get("remat", False)),
            dtype=dtype,
        )


class GRUEncoder(nn.Module):
    """Unidirectional multi-layer GRU (reference: src/blocks/encoders.py:83-114),
    run as a scanned flax GRUCell per layer."""

    d_input: int
    d_model: int
    n_layers: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        deterministic: bool = True,
    ):
        x = feats.astype(self.dtype)
        b = x.shape[0]
        for layer in range(self.n_layers):
            cell = nn.GRUCell(
                features=self.d_model, dtype=self.dtype,
                kernel_init=nn.initializers.kaiming_normal(),
                name=f"gru{layer}",
            )
            carry = cell.initialize_carry(jax.random.PRNGKey(0), (b, self.d_model))
            scan = nn.RNN(cell, name=f"rnn{layer}")
            x = scan(x, initial_carry=carry)
            if layer + 1 < self.n_layers and self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x, feat_lengths

    @staticmethod
    def from_config(cfg, dtype=jnp.float32) -> "GRUEncoder":
        return GRUEncoder(
            d_input=int(cfg["d_input"]),
            d_model=int(cfg["d_model"]),
            n_layers=int(cfg["n_layers"]),
            dropout_rate=float(cfg.get("dropout", 0.0)),
            dtype=dtype,
        )
