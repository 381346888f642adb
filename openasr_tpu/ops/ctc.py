"""CTC loss: log-domain forward-backward with a custom VJP.

Matches `F.ctc_loss(log_probs, targets, input_lengths, target_lengths,
reduction='none', blank=V-1)` semantics (reference: src/loss.py:5-11 —
blank is always the LAST vocab id because the tokenizer appends <blk>).

Design (TPU-first): the alpha recursion runs over the padded time axis with
masked updates, so the whole batch is one static-shape `lax.scan`.  The
gradient is NOT autodiff-through-the-scan (which would stack logsumexp/gather
residuals per step and emit T scatter VJPs): a custom VJP runs the classic
beta recursion and forms the posterior occupancy gamma = exp(alpha + beta -
logZ), then scatters it to the vocab axis with one one-hot einsum
([B,T,S] x [B,S,V]) that lands on the MXU.  d logits = (softmax - scatter)
masked to valid frames — the textbook CTC gradient, one reverse scan + one
matmul instead of a differentiated forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

LOG_EPSILON = -1.0e30


def _extended_targets(targets, u_max, s_max, blank_id):
    """Extended label sequence z = [blk, y1, blk, ..., yU, blk] plus the
    skip-transition mask (skip into s allowed when z_s is a label and
    z_s != z_{s-2})."""
    b = targets.shape[0]
    s_idx = lax.broadcasted_iota(jnp.int32, (b, s_max), 1)
    is_label = (s_idx % 2) == 1
    label_pos = jnp.clip((s_idx - 1) // 2, 0, u_max - 1)
    ext = jnp.where(
        is_label,
        jnp.take_along_axis(targets.astype(jnp.int32), label_pos, axis=1),
        blank_id,
    )
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s_max]
    can_skip = is_label & (ext != ext_shift2)
    return s_idx, ext, can_skip


def _ctc_forward(logits, logit_lengths, targets, target_lengths, blank_id):
    """Alpha recursion; returns (losses [B], alphas [T, B, S], aux)."""
    b, t_max, v = logits.shape
    u_max = targets.shape[1]
    s_max = 2 * u_max + 1

    # The full [B, T, V] f32 log-prob tensor is never materialized: the DP
    # only consumes log-probs at the S extended-target ids, and
    # log_softmax(x)[v] = x[v] - logsumexp(x).  Computing the [B, T]
    # normalizer separately and gathering RAW logits cuts ~3 full [B,T,V]
    # f32 HBM passes per step (one write + two re-reads at the flagship
    # shape ≈ 400 MB) down to two bf16 reads of the logits, and halves the
    # custom-VJP residual (the logits input is already live).
    log_z = jax.scipy.special.logsumexp(
        logits.astype(jnp.float32), axis=-1
    )  # [B, T]

    s_idx, ext, can_skip = _extended_targets(targets, u_max, s_max, blank_id)

    target_lengths = target_lengths.astype(jnp.int32)
    logit_lengths = logit_lengths.astype(jnp.int32)
    s_valid = s_idx < (2 * target_lengths[:, None] + 1)

    # Pre-gather the extended-target logits ONCE: ys[b, t, s] =
    # logits[b, t, ext[b, s]] - log_z[b, t].  Gathering inside the scan
    # instead would re-read the whole [B, V] frame from HBM on every one of
    # the T iterations (fwd + bwd ~ 2*T*B*V*4 bytes per train step —
    # measured as ~28% of the flagship step's device time before this
    # change); the DP itself only ever touches [B, S].
    #
    # The gather is expressed as a one-hot batched matmul, NOT
    # take_along_axis: XLA:TPU lowers the latter to a row-at-a-time dynamic
    # gather that measured 6.5 ms/step on the flagship bench (15% of the
    # step), while [B,T,V] x [B,S,V] -> [B,T,S] rides the MXU in ~0.2 ms.
    # The one-hot keeps it EXACT regardless of dtype: each output element is
    # logits[b,t,ext] plus exact zeros (f32 accumulation), so parity with a
    # direct gather is bit-level.
    one_hot_ext = jax.nn.one_hot(ext, v, dtype=logits.dtype)  # [B, S, V]
    ys = jnp.einsum(
        "btv,bsv->bts", logits, one_hot_ext,
        preferred_element_type=jnp.float32,
    ) - log_z[:, :, None]  # [B, T, S]

    # alpha_0: only s=0 (blank) and s=1 (first label) are reachable
    alpha0 = jnp.where(s_idx <= 1, ys[:, 0], LOG_EPSILON)
    alpha0 = jnp.where(s_valid, alpha0, LOG_EPSILON)

    def step(alpha, inputs):
        ys_t, t = inputs  # ys_t: [B, S]
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
        new_alpha = summed + ys_t
        new_alpha = jnp.where(s_valid, new_alpha, LOG_EPSILON)
        # freeze rows whose sequence already ended (t >= logit_length)
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), alpha

    ys_seq = jnp.moveaxis(ys[:, 1:, :], 1, 0)  # [T-1, B, S]
    ts = jnp.arange(1, t_max)
    alpha_final, alpha_hist = lax.scan(step, alpha0, (ys_seq, ts))
    # scan ys collect the PRE-step carry: alpha_hist[k] = alpha at time k
    # (k = 0..T-2); append the final carry for t = T-1
    alphas = jnp.concatenate([alpha_hist, alpha_final[None]], axis=0)

    # total log prob = logsumexp(alpha[S-1], alpha[S-2]), S = 2*tl+1
    s_last = 2 * target_lengths  # index S-1
    a_last = jnp.take_along_axis(alpha_final, s_last[:, None], axis=1)[:, 0]
    s_prev = jnp.maximum(s_last - 1, 0)
    a_prev = jnp.take_along_axis(alpha_final, s_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(target_lengths > 0, a_prev, LOG_EPSILON)
    m = jnp.maximum(a_last, a_prev)
    total = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    aux = (logits, log_z, ys, ext, can_skip, s_idx, s_valid,
           logit_lengths, target_lengths, total)
    return -total, alphas, aux


def _ctc_backward(alphas, aux, g):
    """Beta recursion + posterior occupancy -> d logits.

    gamma_t(s) = exp(alpha_t(s) + beta_t(s) - logZ); beta_t excludes lp at t
    and sums allowed continuations.  dL/dlp[t, v] = -sum_{s: ext_s=v} gamma;
    through log_softmax: d logits = (softmax * 1{t<len} - scatter(gamma)).
    """
    (logits, log_z, ys, ext, can_skip, s_idx, s_valid,
     logit_lengths, target_lengths, total) = aux
    t_max = logits.shape[1]
    b, s_max = ext.shape
    v = logits.shape[-1]

    # skip OUT of s into s+2 allowed when can_skip[s+2]
    skip_out = jnp.pad(
        can_skip, ((0, 0), (0, 2)), constant_values=False
    )[:, 2:]

    s_last = 2 * target_lengths
    terminal = jnp.where(
        (s_idx == s_last[:, None])
        | ((s_idx == s_last[:, None] - 1) & (target_lengths[:, None] > 0)),
        0.0,
        LOG_EPSILON,
    )

    def step(beta_next, inputs):
        ys_tp1, t = inputs  # pre-gathered lp at time t+1; computing beta_t
        w = ys_tp1 + beta_next  # [B, S]
        w = jnp.where(s_valid, w, LOG_EPSILON)
        stay = w
        adv1 = jnp.pad(w, ((0, 0), (0, 1)), constant_values=LOG_EPSILON)[:, 1:]
        adv2 = jnp.pad(w, ((0, 0), (0, 2)), constant_values=LOG_EPSILON)[:, 2:]
        adv2 = jnp.where(skip_out, adv2, LOG_EPSILON)
        stacked = jnp.stack([stay, adv1, adv2], axis=0)
        m = jnp.max(stacked, axis=0)
        beta_t = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        # at the last valid frame (t == len-1) beta is the terminal vector;
        # beyond the end it is irrelevant (occupancy masked) but must not
        # poison earlier steps, so force terminal there too
        use_terminal = (t >= logit_lengths - 1)[:, None]
        beta_t = jnp.where(use_terminal, terminal, beta_t)
        return beta_t, beta_t

    ys_seq = jnp.moveaxis(ys[:, 1:, :], 1, 0)  # ys at t = 1..T-1
    ts = jnp.arange(t_max - 1)
    beta_T = terminal  # carry for t = T-1
    _, betas_rev = lax.scan(step, beta_T, (ys_seq[::-1], ts[::-1]))
    # betas_rev[k] = beta at t = T-2-k; assemble beta_t for t = 0..T-1
    betas = jnp.concatenate(
        [betas_rev[::-1], terminal[None]], axis=0
    )  # [T, B, S] with beta_{T-1} = terminal (overridden by use_terminal rule
    # for shorter sequences inside the scan)

    log_p = total  # [B] (log p = total; loss was -total)
    occ_log = alphas + betas - log_p[None, :, None]
    occ = jnp.exp(jnp.minimum(occ_log, 0.0))  # clamp guards padded rows
    occ = jnp.where(s_valid[None], occ, 0.0)
    t_idx = lax.broadcasted_iota(jnp.int32, (t_max, b, 1), 0)
    occ = jnp.where(t_idx < logit_lengths[None, :, None], occ, 0.0)
    occ = jnp.moveaxis(occ, 0, 1)  # [B, T, S]

    # The scatter materializes a [B, T, V] tensor that is immediately
    # subtracted from the recomputed softmax and cast to the logits dtype.
    # Under bf16 training, emit it in bf16 directly (the MXU still
    # accumulates f32 internally; only the final store rounds) — this
    # halves the largest HBM write+read in the backward (~134 MB f32 at
    # the flagship shape).  f32 logits (the parity-test path) keep an
    # exact f32 scatter.
    mm_dtype = (
        jnp.bfloat16 if logits.dtype == jnp.bfloat16 else occ.dtype
    )
    one_hot = jax.nn.one_hot(ext, v, dtype=mm_dtype)  # [B, S, V]
    scatter = jnp.einsum(
        "bts,bsv->btv", occ.astype(mm_dtype), one_hot,
        preferred_element_type=mm_dtype,
    ).astype(jnp.float32)

    valid_t = (
        lax.broadcasted_iota(jnp.int32, (b, t_max, 1), 1)
        < logit_lengths[:, None, None]
    )
    # softmax recomputed from the (already-live) logits + the tiny [B, T]
    # normalizer instead of re-reading a stored f32 log-prob tensor
    probs = jnp.exp(logits.astype(jnp.float32) - log_z[:, :, None]) * valid_t
    # occupancy sums to 1 on valid frames, so d(-log p)/d logits:
    dlogits = probs - scatter
    # zero out degenerate rows (empty targets: caller masks their loss)
    dlogits = jnp.where(target_lengths[:, None, None] > 0, dlogits, 0.0)
    return dlogits * g[:, None, None]


@jax.custom_vjp
def ctc_loss_from_logits(logits, logit_lengths, targets, target_lengths,
                         blank_id):
    losses, _, _ = _ctc_forward(
        logits, logit_lengths, targets, target_lengths, blank_id
    )
    return losses


def _ctc_vjp_fwd(logits, logit_lengths, targets, target_lengths, blank_id):
    losses, alphas, aux = _ctc_forward(
        logits, logit_lengths, targets, target_lengths, blank_id
    )
    # residuals must be JAX types: carry a 0-d token of the logits dtype
    return losses, (alphas, aux, jnp.zeros([], logits.dtype))


def _ctc_vjp_bwd(res, g):
    alphas, aux, dtype_token = res
    dlogits = _ctc_backward(alphas, aux, g)
    return dlogits.astype(dtype_token.dtype), None, None, None, None


ctc_loss_from_logits.defvjp(_ctc_vjp_fwd, _ctc_vjp_bwd)


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
    if blank_id is None:
        blank_id = logits.shape[-1] - 1
    return ctc_loss_from_logits(
        logits, logit_lengths, targets, target_lengths, blank_id
    )


def cal_ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Summed CTC loss with blank = V-1 (reference: src/loss.py:5-11).
    Sequences with target_length <= 0 contribute zero (supports padded
    dummy rows in quantized batches), and impossible alignments (frames
    shorter than the label repetition structure requires) are zeroed like
    torch's zero_infinity — an inf loss would otherwise poison every other
    sequence in the batch."""
    losses = ctc_loss(logits, logit_lengths, targets, target_lengths)
    losses = jnp.where(target_lengths > 0, losses, 0.0)
    losses = jnp.where(losses < 1.0e29, losses, 0.0)
    return jnp.sum(losses)
