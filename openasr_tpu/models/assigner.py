"""CIF attention assigner: conv stack -> sigmoid weight per frame.

Capability parity with reference: src/blocks/attention_assigner.py:10-81.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from openasr_tpu.ops.masks import sequence_mask

Dtype = Any


class AttentionAssigner(nn.Module):
    """Same-pad Conv1d stack + ReLU -> dropout -> linear -> sigmoid,
    masked by sequence validity (reference: attention_assigner.py:10-46).
    The reference pads right and truncates (conv_layers.py:8-46 'same'
    mode); causal-equivalent right padding is reproduced here."""

    d_model: int
    n_layers: int
    w_context: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        t = x.shape[1]
        x = x.astype(self.dtype)
        # The reference right-pads the INPUT once by n_layers*w_context
        # zeros, runs the whole VALID conv stack, then truncates to T
        # (conv_layers.py:30-41).  Padding per layer instead would feed
        # layer i+1 exact zeros at the tail where the reference feeds it
        # layer i's outputs over the padded region (relu(bias + partial
        # sums), generally nonzero) — diverging on the last w_context-1
        # valid frames whenever n_layers >= 2.
        x = jnp.pad(
            x, ((0, 0), (0, self.n_layers * self.w_context), (0, 0))
        )
        for i in range(self.n_layers):
            x = nn.Conv(
                self.d_model, (self.w_context,), padding="VALID",
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        x = x[:, :t]
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        alphas = nn.Dense(1, dtype=self.dtype, name="linear")(x)[..., 0]
        alphas = nn.sigmoid(alphas.astype(jnp.float32))
        return alphas * sequence_mask(lengths, t, dtype=jnp.float32)

    @staticmethod
    def from_config(cfg, dtype=jnp.float32):
        if str(cfg.get("type", "1d")).lower() in ("2d", "conv2d"):
            return AttentionAssigner2D(
                d_model=int(cfg["d_model"]),
                n_layers=int(cfg["n_layers"]),
                dropout_rate=float(cfg.get("dropout", 0.0)),
                dtype=dtype,
            )
        return AttentionAssigner(
            d_model=int(cfg["d_model"]),
            n_layers=int(cfg["n_layers"]),
            w_context=int(cfg["w_context"]),
            dropout_rate=float(cfg.get("dropout", 0.0)),
            dtype=dtype,
        )


class AttentionAssigner2D(nn.Module):
    """2D-conv assigner variant (reference: attention_assigner.py:49-81):
    a Conv2d feature extractor over the (time, feature) plane — 32-channel
    3x3 conv + (n_layers-1) 1x1 convs, each ReLU'd — then an affine
    [32*D -> d_model], dropout, linear -> sigmoid, masked.

    Deviation note: the reference's conv (conv_layers.py:49-77) uses time
    stride (2, 1) yet returns unchanged feat_lengths and slices the first T
    frames, which only type-checks because of a fixed +20 pad — i.e. it is
    inconsistent with the CIF contract that alphas align 1:1 with encoder
    frames. This rebuild keeps stride 1 in time so the contract holds; the
    channel/affine structure matches the reference."""

    d_model: int
    n_layers: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, t, d = x.shape
        h = x.astype(self.dtype)[..., None]  # [B, T, D, 1]
        # right-pad + truncate, like the reference's F.pad(feats, (0,20,0,20))
        h = jnp.pad(h, ((0, 0), (0, 2), (0, 2), (0, 0)))
        h = nn.Conv(
            32, (3, 3), padding="VALID", dtype=self.dtype, name="conv0"
        )(h)
        h = nn.relu(h)
        for i in range(1, self.n_layers):
            h = nn.Conv(
                32, (1, 1), padding="VALID", dtype=self.dtype,
                name=f"conv{i}",
            )(h)
            h = nn.relu(h)
        h = h[:, :t, :d].reshape(b, t, 32 * d)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="affine")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        alphas = nn.Dense(1, dtype=self.dtype, name="linear")(h)[..., 0]
        alphas = nn.sigmoid(alphas.astype(jnp.float32))
        return alphas * sequence_mask(lengths, t, dtype=jnp.float32)
