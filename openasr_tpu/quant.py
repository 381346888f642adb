"""Weight-only int8 quantization for serving.

Decode is weight-bound: beam search runs small-batch GEMMs whose HBM
traffic is dominated by reading the parameters, and a serving artifact's
params travel host->device on every new-checkpoint push.  Storing the
weights as int8 with per-channel f32 scales quarters both against f32
(halves against bf16); the exported program dequantizes on device (one
fused multiply per weight read site) and all matmul arithmetic stays in
the model's compute dtype, so accuracy loss is bounded by the
quantization step (max elementwise error = scale/2, per channel).

This is capability beyond the reference (no quantized deployment story
there); it composes with serving.export_beam_decode(weights="int8").

Representation: an eligible leaf W [.., C] becomes
    {"int8:q": int8[.., C], "int8:scale": f32[C]}
with symmetric per-last-axis scales (the output-channel axis of flax
Dense/Conv kernels).  Ineligible leaves (biases, norms, small tensors,
integer arrays) pass through untouched, so the quantized tree keeps the
checkpoint-package shape and the exported calling convention stays a
plain pytree of arrays.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Q_KEY = "int8:q"
SCALE_KEY = "int8:scale"

# don't bother with tensors smaller than this (biases, LayerNorm params):
# no bandwidth to win, and 1D tensors lack a channel axis
MIN_SIZE = 4096


def _eligible(x) -> bool:
    return (
        hasattr(x, "ndim")
        and x.ndim >= 2
        and np.issubdtype(np.asarray(x).dtype, np.floating)
        and x.size >= MIN_SIZE
    )


def quantize_params(params) -> Any:
    """Host-side: replace every eligible float leaf with its int8
    representation.  Runs in NumPy (no device round-trip)."""

    def one(x):
        if not _eligible(x):
            return x
        w = np.asarray(x)
        wf = w.astype(np.float32)
        amax = np.max(np.abs(wf), axis=tuple(range(w.ndim - 1)))
        scale = (amax / 127.0).astype(np.float32)
        safe = np.where(scale > 0, scale, 1.0)
        q = np.clip(np.rint(wf / safe), -127, 127).astype(np.int8)
        return {Q_KEY: q, SCALE_KEY: scale}

    return jax.tree_util.tree_map(one, params)


def is_quantized_leaf(node) -> bool:
    return isinstance(node, dict) and Q_KEY in node


def dequantize_params(qparams) -> Any:
    """Traceable: reconstruct the dense weight tree inside a jitted /
    exported function.  XLA fuses the int8 read + multiply into the
    consumer where profitable."""

    def one(node):
        if is_quantized_leaf(node):
            # model params are always f32 (flax default param_dtype);
            # compute-dtype casts happen inside the modules
            return node[Q_KEY].astype(jnp.float32) * node[SCALE_KEY]
        return node

    return jax.tree_util.tree_map(
        one, qparams, is_leaf=is_quantized_leaf
    )


def quantization_error(params, qparams) -> float:
    """Max |W - dequant(Q)| / scale over all quantized leaves — must be
    <= 0.5 by construction (rounding); used by tests."""
    worst = 0.0
    flat_p = jax.tree_util.tree_leaves(params)
    flat_q = jax.tree_util.tree_leaves(
        qparams, is_leaf=is_quantized_leaf
    )
    for p, q in zip(flat_p, flat_q):
        if not is_quantized_leaf(q):
            continue
        w = np.asarray(p, np.float32)
        deq = np.asarray(q[Q_KEY], np.float32) * np.asarray(q[SCALE_KEY])
        scale = np.maximum(np.asarray(q[SCALE_KEY]), 1e-30)
        worst = max(worst, float(np.max(np.abs(w - deq) / scale)))
    return worst
