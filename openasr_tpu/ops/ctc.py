"""CTC loss: log-domain forward algorithm as a `lax.scan` over time.

Matches `F.ctc_loss(log_probs, targets, input_lengths, target_lengths,
reduction='none', blank=V-1)` semantics (reference: src/loss.py:5-11 —
blank is always the LAST vocab id because the tokenizer appends <blk>).

Design: the alpha recursion runs over the padded time axis with masked
updates, so the whole batch is one static-shape scan; gradients come from
autodiff through the scan (exact for this DP).  The per-step work is a
[B, S] gather + logsumexp — bandwidth-bound VPU work that XLA fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

LOG_EPSILON = -1.0e30


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int | None = None,
) -> jnp.ndarray:
    """Per-sequence negative log likelihood, shape [B].

    Args:
      logits: [B, T, V] unnormalized scores.
      logit_lengths: [B] valid frame counts.
      targets: [B, U] label ids (no blanks); padding values are ignored
        beyond target_lengths.
      target_lengths: [B] valid label counts.
      blank_id: blank label id; defaults to V-1 (reference convention).
    """
    b, t_max, v = logits.shape
    u_max = targets.shape[1]
    s_max = 2 * u_max + 1
    if blank_id is None:
        blank_id = v - 1

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # Extended label sequence z: [blank, y1, blank, y2, ..., yU, blank]
    s_idx = lax.broadcasted_iota(jnp.int32, (b, s_max), 1)
    is_label = (s_idx % 2) == 1
    label_pos = jnp.clip((s_idx - 1) // 2, 0, u_max - 1)
    ext = jnp.where(
        is_label,
        jnp.take_along_axis(
            targets.astype(jnp.int32), label_pos, axis=1
        ),
        blank_id,
    )  # [B, S]

    # Skip-transition allowed into s when z_s is a label and z_s != z_{s-2}
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s_max]
    can_skip = is_label & (ext != ext_shift2)

    target_lengths = target_lengths.astype(jnp.int32)
    logit_lengths = logit_lengths.astype(jnp.int32)
    s_valid = s_idx < (2 * target_lengths[:, None] + 1)

    # alpha_0: only s=0 (blank) and s=1 (first label) are reachable
    lp0 = jnp.take_along_axis(log_probs[:, 0, :], ext, axis=1)
    alpha0 = jnp.where(s_idx <= 1, lp0, LOG_EPSILON)
    alpha0 = jnp.where(s_valid, alpha0, LOG_EPSILON)

    def step(alpha, inputs):
        lp_t, t = inputs  # lp_t: [B, V]
        prev1 = jnp.pad(
            alpha, ((0, 0), (1, 0)), constant_values=LOG_EPSILON
        )[:, :s_max]
        prev2 = jnp.pad(
            alpha, ((0, 0), (2, 0)), constant_values=LOG_EPSILON
        )[:, :s_max]
        prev2 = jnp.where(can_skip, prev2, LOG_EPSILON)
        stacked = jnp.stack([alpha, prev1, prev2], axis=0)
        m = jnp.max(stacked, axis=0)
        summed = m + jnp.log(
            jnp.sum(jnp.exp(stacked - m[None]), axis=0)
        )
        lp_ext = jnp.take_along_axis(lp_t, ext, axis=1)
        new_alpha = summed + lp_ext
        new_alpha = jnp.where(s_valid, new_alpha, LOG_EPSILON)
        # freeze rows whose sequence already ended (t >= logit_length)
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    lp_seq = jnp.moveaxis(log_probs[:, 1:, :], 1, 0)  # [T-1, B, V]
    ts = jnp.arange(1, t_max)
    alpha_final, _ = lax.scan(step, alpha0, (lp_seq, ts))

    # total log prob = logsumexp(alpha[S-1], alpha[S-2]), S = 2*tl+1
    s_last = 2 * target_lengths  # index S-1
    a_last = jnp.take_along_axis(alpha_final, s_last[:, None], axis=1)[:, 0]
    s_prev = jnp.maximum(s_last - 1, 0)
    a_prev = jnp.take_along_axis(alpha_final, s_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(target_lengths > 0, a_prev, LOG_EPSILON)
    m = jnp.maximum(a_last, a_prev)
    total = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return -total


def cal_ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Summed CTC loss with blank = V-1 (reference: src/loss.py:5-11).
    Sequences with target_length <= 0 contribute zero (supports padded
    dummy rows in quantized batches)."""
    losses = ctc_loss(logits, logit_lengths, targets, target_lengths)
    losses = jnp.where(target_lengths > 0, losses, 0.0)
    return jnp.sum(losses)
