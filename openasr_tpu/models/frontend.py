"""Signal front-ends: SPLayer (fbank + SpecAug) and WavConv raw-wave encoder.

Capability parity with reference: src/blocks/sp_layers.py:23-133.  SPLayer's
per-utterance Python fbank loop becomes one batched call into
openasr_tpu.ops.fbank; SpecAug uses the 'aug' RNG collection.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from openasr_tpu.ops.fbank import FbankConfig, fbank
from openasr_tpu.ops.specaug import SpecAugConfig, spec_aug

Dtype = Any


class SPLayer(nn.Module):
    """feature_type 'offline' (passthrough) or 'fbank' (online batched
    log-mel); SpecAugment in training mode (reference:
    src/blocks/sp_layers.py:23-101)."""

    feature_type: str = "offline"
    fbank_config: Optional[FbankConfig] = None
    spec_aug_config: Optional[SpecAugConfig] = None
    apply_dither: bool = False

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,
        lengths: jnp.ndarray,
        deterministic: bool = True,
    ):
        if self.feature_type == "fbank":
            dither_key = None
            if not deterministic and self.apply_dither:
                dither_key = self.make_rng("aug")
            feats, feat_lengths = fbank(
                inputs, lengths, self.fbank_config or FbankConfig(),
                dither_key=dither_key,
            )
        elif self.feature_type == "offline":
            feats, feat_lengths = inputs, lengths
        else:
            raise ValueError(f"Unknown feature type {self.feature_type}")

        if not deterministic and self.spec_aug_config is not None:
            feats = spec_aug(
                self.make_rng("aug"), feats, feat_lengths, self.spec_aug_config
            )
        return feats, feat_lengths


class WavConv(nn.Module):
    """5-layer strided Conv1d+BatchNorm+ReLU raw-waveform encoder,
    total downsample x160 (reference: src/blocks/sp_layers.py:104-133).
    Used by CPC pretraining and GRU-CTC finetuning."""

    d_model: int
    dtype: Dtype = jnp.float32

    _LAYERS = ((10, 5, 3), (8, 4, 2), (4, 2, 1), (4, 2, 1), (4, 2, 1))

    @nn.compact
    def __call__(
        self,
        waves: jnp.ndarray,
        wave_lengths: jnp.ndarray,
        use_running_average: bool = True,
    ):
        x = waves[..., None]  # [B, N, 1]
        for i, (k, s, p) in enumerate(self._LAYERS):
            x = nn.Conv(
                self.d_model, (k,), strides=(s,), padding=[(p, p)],
                use_bias=False, dtype=self.dtype, name=f"conv{i}",
            )(x)
            # flax momentum is the EMA retention factor: torch's
            # BatchNorm1d momentum=0.1 (reference default) == flax 0.9;
            # flax's own default 0.99 would converge running stats 10x
            # slower than the reference
            x = nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.9, dtype=self.dtype, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        out_lengths = wave_lengths // 160
        max_t = x.shape[1]
        # reference truncates to len_x.max(); with static shapes keep full
        # padded length and rely on masks downstream.
        del max_t
        return x, out_lengths
