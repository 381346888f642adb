"""Continuous Integrate-and-Fire (CIF), fully parallel on the MXU.

Capability parity with the reference's Python-loop `cif()` and the
quantity-scaling that precedes it (reference:
src/frameworks/Speech_Models.py:345-413): sequential accumulation of
alpha-weighted encoder frames, firing when the integrator exceeds the
threshold, with remainder carry-over into the next output frame.

TPU re-design, two generations:

* `cif_scan` — the per-timestep loop as a `lax.scan` with carry
  (integrate [B], frame [B, D]); the ragged gather of fired frames is a
  cumsum + scatter into a fixed-capacity buffer.  Correct, but T
  sequential steps of tiny VPU work (plus a second scan in the VJP)
  serialize on hardware.

* `cif_parallel` (default) — a closed form with NO sequential dependence.
  The integrate-and-fire recurrence has an exact parallel-prefix
  solution: with S_t = cumsum(alpha) and c_t = max(0, ceil(S_t - thr)),
  the fire count obeys F_t = min(F_{t-1}+1, c_t) (at most one fire per
  frame, exactly like the reference loop even when a scaled alpha > 1),
  which unrolls to F_t = t + min(1, cummin_j(c_j - j)) — one cumulative
  min.  Each frame then contributes to at most two output slots
  (F_{t-1} gets `1 - integrate` on fire / alpha otherwise; F_{t-1}+1
  gets the remainder), so the output assembly is a one-hot weight
  matrix [B,T,K] batched-matmul'd with hidden [B,T,D] on the MXU —
  no scan, no scatter, and the backward is two more matmuls.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def scale_alphas(
    alphas: jnp.ndarray,
    target_lengths: jnp.ndarray,
    noise_key=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train-time quantity scaling: alphas *= (N + U(-0.45, 0.45)) / sum(alphas)
    (reference: Speech_Models.py:348-352).  Returns (scaled alphas, raw sum)."""
    raw_num = jnp.sum(alphas, axis=-1)  # [B]
    num = target_lengths.astype(jnp.float32)
    if noise_key is not None:
        num = num + 0.9 * jax.random.uniform(noise_key, num.shape) - 0.45
    scale = num / jnp.maximum(raw_num, 1e-9)
    return alphas * scale[:, None], raw_num


def cif_scan(
    hidden: jnp.ndarray,
    alphas: jnp.ndarray,
    capacity: int,
    threshold: float = 0.95,
) -> jnp.ndarray:
    """Integrate-and-fire via `lax.scan`. hidden [B, T, D], alphas [B, T]
    -> fired frames [B, capacity, D] (zero-padded).

    reference: Speech_Models.py:363-413 (cif).
    """
    b, t, d = hidden.shape
    hidden = hidden.astype(jnp.float32)
    alphas = alphas.astype(jnp.float32)

    def step(carry, inputs):
        integrate, frame = carry
        alpha_t, hidden_t = inputs  # [B], [B, D]
        completion = 1.0 - integrate
        integrate = integrate + alpha_t
        fire = integrate > threshold
        cur = jnp.where(fire, completion, alpha_t)
        remainds = alpha_t - cur
        emitted = frame + cur[:, None] * hidden_t
        new_frame = jnp.where(
            fire[:, None], remainds[:, None] * hidden_t, emitted
        )
        new_integrate = jnp.where(fire, integrate - 1.0, integrate)
        return (new_integrate, new_frame), (fire, emitted)

    init = (jnp.zeros((b,), jnp.float32), jnp.zeros((b, d), jnp.float32))
    _, (fires, frames) = lax.scan(
        step,
        init,
        (jnp.moveaxis(alphas, 1, 0), jnp.moveaxis(hidden, 1, 0)),
    )
    fires = jnp.moveaxis(fires, 1, 0)  # [B, T] bool
    frames = jnp.moveaxis(frames, 1, 0)  # [B, T, D]

    # compact fired frames left into [B, capacity, D]
    pos = jnp.cumsum(fires.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(fires, pos, capacity)  # non-fired scatter out of range
    out = jnp.zeros((b, capacity + 1, d), jnp.float32)
    bi = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
    out = out.at[bi, pos].set(frames, mode="drop")
    return out[:, :capacity]


def cif_parallel(
    hidden: jnp.ndarray,
    alphas: jnp.ndarray,
    capacity: int,
    threshold: float = 0.95,
) -> jnp.ndarray:
    """Closed-form integrate-and-fire (see module docstring): cumulative
    min for the fire count, one-hot batched matmul for the output frames.
    Bit-for-bit semantics of `cif_scan` up to f32 summation order
    (sequential adds there, cumsum + exact-f32 dot here)."""
    b, t, d = hidden.shape
    hidden = hidden.astype(jnp.float32)
    alphas = alphas.astype(jnp.float32)

    s = jnp.cumsum(alphas, axis=1)  # S_t, [B, T]
    c = jnp.maximum(jnp.ceil(s - threshold), 0.0)  # fire-count bound
    # F_t = min(F_{t-1}+1, c_t)  ==  t + min(1, cummin_{j<=t}(c_j - j)):
    # an integer n satisfies n < S_t - thr  iff  n <= ceil(S_t - thr) - 1,
    # so "fire iff F_{t-1} < S_t - thr" is exactly the min-recurrence.
    j = jnp.arange(t, dtype=jnp.float32)
    m = lax.cummin(c - j[None, :], axis=1)
    fires_cum = j[None, :] + jnp.minimum(m, 1.0)  # F_t, exact integers
    f_prev = jnp.pad(fires_cum[:, :-1], ((0, 0), (1, 0)))  # F_{t-1}, F_-1=0
    fire = fires_cum > f_prev + 0.5

    s_prev = s - alphas
    completion = 1.0 - (s_prev - f_prev)  # 1 - integrate_{t-1}
    w_low = jnp.where(fire, completion, alphas)  # -> slot F_{t-1}
    w_high = jnp.where(fire, alphas - completion, 0.0)  # -> slot F_{t-1}+1

    # a slot is emitted iff it fired (k < F_T) and fits the capacity;
    # everything else (the trailing partial frame, overflow) routes to a
    # dump slot that is sliced away
    n_fires = fires_cum[:, -1:]  # [B, 1]
    limit = jnp.minimum(n_fires, float(capacity))
    k_low = f_prev
    k_high = f_prev + 1.0
    k_low = jnp.where(k_low < limit, k_low, float(capacity))
    k_high = jnp.where(k_high < limit, k_high, float(capacity))

    w = (
        jax.nn.one_hot(k_low.astype(jnp.int32), capacity + 1,
                       dtype=jnp.float32) * w_low[..., None]
        + jax.nn.one_hot(k_high.astype(jnp.int32), capacity + 1,
                         dtype=jnp.float32) * w_high[..., None]
    )  # [B, T, capacity+1]
    out = jnp.einsum(
        "btk,btd->bkd", w, hidden, precision=lax.Precision.HIGHEST
    )
    return out[:, :capacity]


def cif(
    hidden: jnp.ndarray,
    alphas: jnp.ndarray,
    capacity: int,
    threshold: float = 0.95,
) -> jnp.ndarray:
    """Integrate-and-fire. hidden [B, T, D], alphas [B, T] ->
    fired frames [B, capacity, D] (zero-padded).

    Dispatches to the parallel closed form (default) or the scan
    (`OPENASR_CIF_IMPL=scan`).  reference: Speech_Models.py:363-413.
    """
    if os.environ.get("OPENASR_CIF_IMPL", "parallel") == "scan":
        return cif_scan(hidden, alphas, capacity, threshold)
    return cif_parallel(hidden, alphas, capacity, threshold)


def cif_output_lengths(alphas: jnp.ndarray) -> jnp.ndarray:
    """Inference length = round(sum(alphas)) (reference: Speech_Models.py:420)."""
    return jnp.round(jnp.sum(alphas, axis=-1)).astype(jnp.int32)
