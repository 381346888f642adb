"""Decoders: Transformer (weight-tied, KV-cached), CIF decoder, FC decoder.

Capability parity with reference: src/blocks/decoders.py:25-199.  The
autoregressive step path uses the functional KV cache from
openasr_tpu.models.layers instead of the reference's full re-forward
(reference: src/blocks/decoders.py:83-84).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from openasr_tpu.models.layers import (
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    XAVIER_UNIFORM,
    positional_encoding,
)
from openasr_tpu.ops.masks import NEG_INF

Dtype = Any

XAVIER_NORMAL = nn.initializers.xavier_normal()


class TransformerDecoder(nn.Module):
    """Embedding (weight-tied to the output affine,
    reference: src/blocks/decoders.py:55) x sqrt(d) -> PE -> dropout ->
    N post-LN decoder layers -> tied output affine.

    Note the reference's double-scale quirk is reproduced: embeddings are
    scaled by sqrt(d) and PE scales its input by sqrt(d) again
    (see models/layers.py docstring)."""

    vocab_size: int
    d_model: int
    nhead: int
    num_layers: int
    encoder_dim: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    remat: bool = False  # jax.checkpoint each layer: trade FLOPs for HBM
    dtype: Dtype = jnp.float32

    def setup(self):
        self.emb = nn.Embed(
            self.vocab_size,
            self.d_model,
            embedding_init=XAVIER_NORMAL,
            dtype=self.dtype,
            name="emb",
        )
        self.out_bias = self.param(
            "out_bias", nn.initializers.zeros, (self.vocab_size,)
        )
        self.dropout = nn.Dropout(self.dropout_rate)
        layer_cls = (
            # statics: deterministic (5) and tgt_causal (6); indices count self as 0
            # and only apply to POSITIONAL args (see __call__ below)
            nn.remat(TransformerDecoderLayer, static_argnums=(5, 6))
            if self.remat
            else TransformerDecoderLayer
        )
        self.layers = [
            layer_cls(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout_rate, self.activation, self.dtype,
                name=f"layer{i}",
            )
            for i in range(self.num_layers)
        ]

    def _embed(self, ids: jnp.ndarray, offset: int = 0) -> jnp.ndarray:
        x = self.emb(ids.astype(jnp.int32)) * math.sqrt(self.d_model)
        return positional_encoding(x, offset=offset)

    def _output(self, h: jnp.ndarray) -> jnp.ndarray:
        return self.emb.attend(h) + self.out_bias

    def __call__(
        self,
        memory: jnp.ndarray,
        memory_lengths: jnp.ndarray,
        ids: jnp.ndarray,
        id_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = self._embed(ids)
        x = self.dropout(x, deterministic=deterministic)
        # Targets are right-padded, so the causal mask alone already blocks
        # every valid query from attending padded keys; padded query rows are
        # masked out downstream by the CE loss (reference combined causal +
        # key-padding masks, src/blocks/decoders.py:57-81 — same losses).
        for layer in self.layers:
            x = layer(
                x, memory, None, None, deterministic, True, memory_lengths
            )
        return self._output(x)

    # ------------------------------------------------------- decode path

    def init_cache(
        self, memory: jnp.ndarray, max_len: int
    ) -> List[dict]:
        b = memory.shape[0]
        return [l.init_cache(b, max_len, memory) for l in self.layers]

    def step(
        self,
        tokens: jnp.ndarray,
        index,
        cache: List[dict],
        memory_bias: Optional[jnp.ndarray],
        max_len: int,
    ) -> Tuple[jnp.ndarray, List[dict]]:
        """tokens [B] -> (logits [B, V], new cache); index is the 0-based
        position of `tokens` in the output sequence."""
        x = self._embed(tokens[:, None], offset=index)
        pos = lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
        self_bias = jnp.where(pos <= index, 0.0, NEG_INF)
        new_cache = []
        for layer, c in zip(self.layers, cache):
            x, nc = layer.step(x, c, index, self_bias, memory_bias)
            new_cache.append(nc)
        return self._output(x)[:, 0], new_cache


class CIFDecoder(nn.Module):
    """Non-autoregressive decoder over CIF outputs: affine(concat(encoded,
    shifted-target emb)) -> causal self-attn encoder stack ->
    affine(concat(encoded, out)) (reference: src/blocks/decoders.py:87-177)."""

    vocab_size: int
    d_model: int
    nhead: int
    num_layers: int
    encoder_dim: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.emb = nn.Embed(
            self.vocab_size, self.d_model, embedding_init=XAVIER_NORMAL,
            dtype=self.dtype, name="emb",
        )
        self.input_affine = nn.Dense(
            self.d_model, kernel_init=XAVIER_UNIFORM, dtype=self.dtype,
            name="input_affine",
        )
        self.output_affine = nn.Dense(
            self.vocab_size, kernel_init=XAVIER_NORMAL, dtype=self.dtype,
            name="output_affine",
        )
        self.dropout = nn.Dropout(self.dropout_rate)
        self.layers = [
            TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout_rate, self.activation, self.dtype,
                name=f"layer{i}",
            )
            for i in range(self.num_layers)
        ]

    def _body(
        self,
        encoded: jnp.ndarray,
        ids: jnp.ndarray,
        lengths: jnp.ndarray,
        deterministic: bool,
    ) -> jnp.ndarray:
        t = encoded.shape[1]
        x = self.emb(ids.astype(jnp.int32)) * math.sqrt(self.d_model)
        x = positional_encoding(x)
        x = self.dropout(x, deterministic=deterministic)
        h = self.input_affine(jnp.concatenate([encoded, x], axis=-1))
        for layer in self.layers:
            h = layer(h, None, deterministic, kv_lengths=lengths, causal=True)
        return self.output_affine(jnp.concatenate([encoded, h], axis=-1))

    def __call__(
        self,
        encoded: jnp.ndarray,
        ids: jnp.ndarray,
        id_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """encoded [B, T, D] (CIF outputs, aligned with targets), ids [B, T]."""
        return self._body(encoded, ids, id_lengths, deterministic)

    def step(
        self,
        encoded: jnp.ndarray,
        encoded_lengths: jnp.ndarray,
        ids_prefix: jnp.ndarray,
        t,
    ) -> jnp.ndarray:
        """Step t: ids_prefix [B, T] holds tokens so far (padded); returns
        logits at position t-1 — mirroring the reference's pad-and-index
        step_forward (src/blocks/decoders.py:148-177)."""
        logits = self._body(encoded, ids_prefix, encoded_lengths, True)
        idx = jnp.full((logits.shape[0], 1, logits.shape[2]), 0, jnp.int32) + (
            jnp.asarray(t, jnp.int32) - 1
        )
        return jnp.take_along_axis(logits, idx, axis=1)[:, 0]


class FCDecoder(nn.Module):
    """Single linear projection (reference: src/blocks/decoders.py:180-199)."""

    vocab_size: int
    d_input: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, encoded: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.vocab_size, kernel_init=XAVIER_NORMAL, dtype=self.dtype,
            name="output_affine",
        )(encoded)


def transformer_decoder_from_config(cfg, dtype=jnp.float32) -> TransformerDecoder:
    return TransformerDecoder(
        vocab_size=int(cfg["vocab_size"]),
        d_model=int(cfg["d_model"]),
        nhead=int(cfg["nhead"]),
        num_layers=int(cfg["num_layers"]),
        encoder_dim=int(cfg.get("encoder_dim", cfg["d_model"])),
        dim_feedforward=int(cfg["dim_feedforward"]),
        dropout_rate=float(cfg.get("dropout_rate", 0.1)),
        activation=cfg.get("activation", "relu"),
        remat=bool(cfg.get("remat", False)),
        dtype=dtype,
    )


def cif_decoder_from_config(cfg, dtype=jnp.float32) -> CIFDecoder:
    return CIFDecoder(
        vocab_size=int(cfg["vocab_size"]),
        d_model=int(cfg["d_model"]),
        nhead=int(cfg["nhead"]),
        num_layers=int(cfg["num_layers"]),
        encoder_dim=int(cfg.get("encoder_dim", cfg["d_model"])),
        dim_feedforward=int(cfg["dim_feedforward"]),
        dropout_rate=float(cfg.get("dropout_rate", 0.1)),
        activation=cfg.get("activation", "relu"),
        dtype=dtype,
    )
