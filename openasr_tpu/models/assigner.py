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
        # reference right-pads by n_layers*w_context then truncates to T
        for i in range(self.n_layers):
            x = jnp.pad(x, ((0, 0), (0, self.w_context - 1), (0, 0)))
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
    def from_config(cfg, dtype=jnp.float32) -> "AttentionAssigner":
        return AttentionAssigner(
            d_model=int(cfg["d_model"]),
            n_layers=int(cfg["n_layers"]),
            w_context=int(cfg["w_context"]),
            dropout_rate=float(cfg.get("dropout", 0.0)),
            dtype=dtype,
        )
