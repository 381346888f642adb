"""SpecAugment, vectorized over the batch with per-example PRNG.

Capability parity with the reference's in-module SpecAug
(reference: src/blocks/sp_layers.py:51-74), including its two quirks:
  * masked regions are filled with feature MEANS, not zeros —
    frequency masks use the per-(batch, frame) mean over mel bins, time
    masks use the per-(batch, bin) mean over valid frames;
  * the fill means are computed ONCE from the unmasked features, before
    any mask is applied.

The reference draws mask sizes/starts per example with Python loops over the
batch; here every mask is a broadcasted-iota comparison so the whole batch is
one fused elementwise XLA op.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SpecAugConfig(NamedTuple):
    freq_mask_num: int = 2
    freq_mask_width: int = 27
    time_mask_num: int = 2
    time_mask_width: int = 40


def spec_aug_config_from_cfg(cfg) -> SpecAugConfig:
    return SpecAugConfig(
        freq_mask_num=int(cfg["freq_mask_num"]),
        freq_mask_width=int(cfg["freq_mask_width"]),
        time_mask_num=int(cfg["time_mask_num"]),
        time_mask_width=int(cfg["time_mask_width"]),
    )


def _interval_mask(size: int, starts: jnp.ndarray, widths: jnp.ndarray):
    """[B] starts/widths -> [B, size] bool mask, True inside [start, start+width)."""
    pos = lax.broadcasted_iota(jnp.int32, (1, size), 1)
    return (pos >= starts[:, None]) & (pos < (starts + widths)[:, None])


def spec_aug(
    key: jax.Array,
    feats: jnp.ndarray,
    feat_lengths: jnp.ndarray,
    cfg: SpecAugConfig,
) -> jnp.ndarray:
    """Apply SpecAugment.  feats: [B, T, V] zero-padded; lengths: [B]."""
    b, t, v = feats.shape
    lengths_f = jnp.maximum(feat_lengths.astype(jnp.float32), 1.0)

    # Fill values, computed once from the unmasked features
    # (reference: src/blocks/sp_layers.py:52-54).
    freq_means = jnp.mean(feats, axis=-1)  # [B, T]
    time_means = jnp.sum(feats, axis=1) / lengths_f[:, None]  # [B, V]

    k_f, k_t = jax.random.split(key)

    # Frequency masks: width ~ floor(W*U), start ~ floor((V-width)*U).
    # When the drawn width exceeds the bin count (freq_mask_width >
    # num_mel_bins configs), the reference's start is negative and its
    # tensor slice follows Python slicing: a negative start WRAPS to
    # v+start (masking only the last |start| bins), and a start below -v
    # clamps to 0 (masking the whole spectrum).  Reproduce both — a naive
    # negative start in the broadcast mask would instead always blank
    # [0, start+width), a different (and usually much larger) region.
    freq_masked = jnp.zeros((b, v), dtype=bool)
    if cfg.freq_mask_num > 0:
        u = jax.random.uniform(k_f, (cfg.freq_mask_num, 2, b))
        for i in range(cfg.freq_mask_num):
            widths = (cfg.freq_mask_width * u[i, 0]).astype(jnp.int32)
            starts = ((v - widths) * u[i, 1]).astype(jnp.int32)
            starts = jnp.where(
                starts < 0, jnp.maximum(v + starts, 0), starts
            )
            freq_masked |= _interval_mask(v, starts, widths)
        feats = jnp.where(
            freq_masked[:, None, :], freq_means[:, :, None], feats
        )

    # Time masks: width ~ floor(W*U), start ~ floor((len-width)*U)
    # (always inside the valid region, reference: sp_layers.py:66-73).
    # When the drawn width exceeds the utterance length, the reference's
    # negative-start slice is (for realistic paddings) EMPTY — no mask.
    # Reproduce that by zeroing the mask width: a naive negative start
    # would instead mask frames [0, start+width), blanking most of a
    # short utterance under the default 40-frame mask widths.
    time_masked = jnp.zeros((b, t), dtype=bool)
    if cfg.time_mask_num > 0:
        u = jax.random.uniform(k_t, (cfg.time_mask_num, 2, b))
        for i in range(cfg.time_mask_num):
            widths = (cfg.time_mask_width * u[i, 0]).astype(jnp.int32)
            widths = jnp.where(
                widths > feat_lengths.astype(jnp.int32), 0, widths
            )
            starts = (
                (feat_lengths.astype(jnp.float32) - widths) * u[i, 1]
            ).astype(jnp.int32)
            time_masked |= _interval_mask(t, starts, widths)
        feats = jnp.where(
            time_masked[:, :, None], time_means[:, None, :], feats
        )

    return feats
