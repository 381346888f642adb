"""Sequence losses: label-smoothed CE, CIF quantity loss, square loss.

Numerics match the reference bit-for-bit in fp32
(reference: src/loss.py:14-54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lse_and_label_logit(logits, labels):
    """[B, U] logsumexp over V and the label's raw logit, both f32.

    The closed form below never materializes a [B, U, V] f32 log-prob
    tensor: log_softmax(x)[y] = x[y] - logsumexp(x), so CE only needs the
    two [B, U] reductions.  The label logit is selected with a fused
    one-hot multiply-reduce (exact: one value plus exact zeros), not
    take_along_axis — XLA:TPU lowers the latter to a row-at-a-time dynamic
    gather (measured on the CTC path: ~30x slower than the reduce)."""
    x32 = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(x32, axis=-1)
    one_hot = jax.nn.one_hot(
        labels.astype(jnp.int32), logits.shape[-1], dtype=jnp.float32
    )
    label_logit = jnp.sum(x32 * one_hot, axis=-1)
    return lse, label_logit


def token_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, paddings: jnp.ndarray
) -> jnp.ndarray:
    """Per-token CE masked by paddings (1.0 = padded), shape [B, U].
    reference: src/loss.py:37-44 (_compute_cross_entropy_losses)."""
    lse, label_logit = _lse_and_label_logit(logits, labels)
    return (lse - label_logit) * (1.0 - paddings.astype(jnp.float32))


def cal_ce_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    paddings: jnp.ndarray,
    label_smooth: float = 0.0,
) -> jnp.ndarray:
    """Summed CE with uniform label smoothing: the smoothed loss mixes the
    hard CE with the mean negative log-prob over the vocabulary
    (reference: src/loss.py:21-35).

    Closed form: -mean_v log_softmax(x)_v = logsumexp(x) - mean_v(x), so
    the smoothing term is also two [B, U] reductions — the whole smoothed
    CE touches the [B, U, V] logits only inside fused V-axis reductions
    (fwd) and one softmax-recompute fusion (autodiff bwd)."""
    loss = jnp.sum(token_cross_entropy(logits, labels, paddings))
    if label_smooth > 0.0:
        x32 = logits.astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(x32, axis=-1)
        ent_uniform = lse - jnp.mean(x32, axis=-1)
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
