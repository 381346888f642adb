"""Sequence losses: label-smoothed CE, CIF quantity loss, square loss.

Numerics match the reference bit-for-bit in fp32
(reference: src/loss.py:14-54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def token_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, paddings: jnp.ndarray
) -> jnp.ndarray:
    """Per-token CE masked by paddings (1.0 = padded), shape [B, U].
    reference: src/loss.py:37-44 (_compute_cross_entropy_losses)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(
        log_probs, labels.astype(jnp.int32)[..., None], axis=-1
    )[..., 0]
    return nll * (1.0 - paddings.astype(jnp.float32))


def cal_ce_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    paddings: jnp.ndarray,
    label_smooth: float = 0.0,
) -> jnp.ndarray:
    """Summed CE with uniform label smoothing: the smoothed loss mixes the
    hard CE with the mean negative log-prob over the vocabulary
    (reference: src/loss.py:21-35)."""
    loss = jnp.sum(token_cross_entropy(logits, labels, paddings))
    if label_smooth > 0.0:
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ent_uniform = -jnp.sum(log_probs, axis=-1) / logits.shape[-1]
        smooth = jnp.sum(ent_uniform * (1.0 - paddings.astype(jnp.float32)))
        loss = loss * (1.0 - label_smooth) + smooth * label_smooth
    return loss


def cal_qua_loss(num_hat: jnp.ndarray, num: jnp.ndarray) -> jnp.ndarray:
    """CIF quantity loss sqrt(sum((n_hat - n)^2))
    (reference: src/loss.py:14-18)."""
    return jnp.sqrt(
        jnp.sum((num_hat.astype(jnp.float32) - num.astype(jnp.float32)) ** 2)
    )


def cal_ce_square_loss(
    prob_square: jnp.ndarray, target_square: jnp.ndarray
) -> jnp.ndarray:
    """L1 over [B,T,T] squares (reference: src/loss.py:47-54)."""
    return jnp.sum(jnp.abs(prob_square - target_square))
