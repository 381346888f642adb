"""Continuous Integrate-and-Fire (CIF) as a jittable `lax.scan`.

Capability parity with the reference's Python-loop `cif()` and the
quantity-scaling that precedes it (reference:
src/frameworks/Speech_Models.py:345-413): sequential accumulation of
alpha-weighted encoder frames, firing when the integrator exceeds the
threshold, with remainder carry-over into the next output frame.

TPU re-design: the per-timestep loop is a `lax.scan` with carry
(integrate [B], frame [B, D]); the ragged gather of fired frames becomes a
cumsum + scatter into a fixed-capacity output buffer (training capacity =
the padded target length; inference capacity = max_decode_len), so the
whole batch stays one static-shape program.
"""

from __future__ import annotations

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


def cif(
    hidden: jnp.ndarray,
    alphas: jnp.ndarray,
    capacity: int,
    threshold: float = 0.95,
) -> jnp.ndarray:
    """Integrate-and-fire. hidden [B, T, D], alphas [B, T] ->
    fired frames [B, capacity, D] (zero-padded).

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


def cif_output_lengths(alphas: jnp.ndarray) -> jnp.ndarray:
    """Inference length = round(sum(alphas)) (reference: Speech_Models.py:420)."""
    return jnp.round(jnp.sum(alphas, axis=-1)).astype(jnp.int32)
