"""Mask construction helpers (static-shape, jit-friendly).

Capability parity with the reference's mask builders
(reference: src/utils.py:158-198) but expressed as boolean arrays built from
`broadcasted_iota`, which XLA fuses into the attention computation instead of
materializing byte masks on the host.

Convention used throughout this framework:
  * ``mask`` / ``valid``: True at VALID positions.
  * attention biases: additive float arrays, 0 at valid, NEG_INF at masked.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

NEG_INF = -1.0e9


def sequence_mask(lengths: jnp.ndarray, maxlen: int, dtype=jnp.bool_):
    """[B] lengths -> [B, maxlen] validity mask (True = valid frame).

    reference: src/utils.py:158-168 (utils.sequence_mask).
    """
    pos = lax.broadcasted_iota(jnp.int32, (1, maxlen), 1)
    return (pos < lengths.astype(jnp.int32)[:, None]).astype(dtype)


def padding_bias(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """[B] lengths -> [B, 1, 1, maxlen] additive key-padding bias for
    [B, H, Tq, Tk] attention logits.

    reference: src/utils.py:170-184 (get_transformer_padding_byte_masks).
    """
    valid = sequence_mask(lengths, maxlen)
    return jnp.where(valid, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)


def causal_bias(length: int) -> jnp.ndarray:
    """[1, 1, T, T] additive causal bias (position t attends to <= t).

    reference: src/utils.py:186-198 (get_transformer_casual_masks).
    """
    q = lax.broadcasted_iota(jnp.int32, (length, length), 0)
    k = lax.broadcasted_iota(jnp.int32, (length, length), 1)
    return jnp.where(k <= q, 0.0, NEG_INF)[None, None].astype(jnp.float32)


def chunk_bias(
    length: int, chunk: int, left_chunks: int = -1, phase: int = 0
) -> jnp.ndarray:
    """[1, 1, T, T] additive chunk-attention bias for streaming-capable
    encoders: frame t belongs to chunk ``(t + phase) // chunk`` and attends
    only to frames in chunks ``[c - left_chunks, c]`` (all earlier chunks
    when ``left_chunks < 0``).  Attention within a chunk is unrestricted.

    ``phase`` aligns training chunk boundaries EXACTLY with the streaming
    executor's output phase (streaming.py): the cached VALID-conv x4
    subsampler emits its first true encoder frame `phase` slots late
    (phase 2 for the wave->fbank frontend — fbank's 2.5-frame lookahead
    rounds to 4 feature slots, /4 subsample + 1 conv slot; phase 1 for
    offline features — 1 conv slot), so the first training chunk holds
    ``chunk - phase`` frames and every later chunk ``chunk``.  Training
    with the matching phase makes cached streaming inference BIT-EXACT
    with the batch forward, not an approximation.  No reference
    counterpart (the reference is batch-only, src/infer.py); this is the
    U2-style streaming story.
    """
    q = lax.broadcasted_iota(jnp.int32, (length, length), 0)
    k = lax.broadcasted_iota(jnp.int32, (length, length), 1)
    qc = (q + phase) // chunk
    kc = (k + phase) // chunk
    ok = kc <= qc
    if left_chunks >= 0:
        ok = ok & (kc >= qc - left_chunks)
    return jnp.where(ok, 0.0, NEG_INF)[None, None].astype(jnp.float32)


def combine_bias(*biases) -> jnp.ndarray:
    """Sum additive biases, clamping so stacked NEG_INFs stay finite."""
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return jnp.maximum(out, NEG_INF) if out is not None else None
