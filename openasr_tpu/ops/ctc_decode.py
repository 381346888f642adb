"""CTC decoding utilities: greedy collapse (`ctc_shrink`) and reduction.

Capability parity with the reference's `ctc_reduce`/`ctc_shrink`
(reference: src/utils.py:202-243) and the greedy sample decode used by
CTC solvers (reference: src/solvers/transformer.py:203-208).  The
sequential collapse loop becomes a cumsum + scatter so the whole batch is
one fused XLA program; a differentiable soft variant feeds the GAN's
generator (reference: src/frameworks/GAN_Models.py:25-32 applies
ctc_shrink to logits before softmax).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from openasr_tpu.ops.masks import sequence_mask


def greedy_path(logits: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Frame-wise argmax [B, T] with padding frames forced to blank (V-1)."""
    v = logits.shape[-1]
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    valid = sequence_mask(lengths, ids.shape[1])
    return jnp.where(valid, ids, v - 1)


def ctc_collapse_mask(
    path: jnp.ndarray, lengths: jnp.ndarray, blank_id: int
) -> jnp.ndarray:
    """True at frames that survive collapse: first of each run, non-blank,
    within the valid region."""
    prev = jnp.pad(path, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    valid = sequence_mask(lengths, path.shape[1])
    return (path != prev) & (path != blank_id) & valid


def ctc_shrink_ids(
    path: jnp.ndarray, lengths: jnp.ndarray, blank_id: int, pad_id: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse repeats and remove blanks, compacted left.

    path [B, T] -> (ids [B, T] pad_id-padded, out_lengths [B]).
    reference: src/utils.py:202-243 (ctc_reduce / ctc_shrink).
    """
    b, t = path.shape
    keep = ctc_collapse_mask(path, lengths, blank_id)
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # target slot
    pos = jnp.where(keep, pos, t)  # dropped frames scatter out of range
    out = jnp.full((b, t + 1), pad_id, jnp.int32)
    bi = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
    out = out.at[bi, pos].set(path, mode="drop")
    out_lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out[:, :t], out_lengths


def ctc_greedy_decode(
    logits: jnp.ndarray, lengths: jnp.ndarray, blank_id: int | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """argmax path -> collapsed token ids (+ lengths)."""
    if blank_id is None:
        blank_id = logits.shape[-1] - 1
    path = greedy_path(logits, lengths)
    return ctc_shrink_ids(path, lengths, blank_id)


def ctc_shrink_soft(
    logits: jnp.ndarray, lengths: jnp.ndarray, blank_id: int | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable shrink: gathers the LOGITS of surviving frames,
    compacted left and zero-padded, as the GAN generator output
    (reference: src/utils.py:212-243 used by GAN_Models.py:25-32).

    Gradients flow to the gathered frames (the selection itself is a
    straight-through hard choice, matching the reference)."""
    b, t, v = logits.shape
    if blank_id is None:
        blank_id = v - 1
    path = greedy_path(logits, lengths)
    keep = ctc_collapse_mask(path, lengths, blank_id)
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(keep, pos, t)
    out = jnp.zeros((b, t + 1, v), logits.dtype)
    bi = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
    out = out.at[bi, pos].set(logits, mode="drop")
    out_lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out[:, :t], out_lengths
