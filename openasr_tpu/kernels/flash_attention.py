"""Pallas TPU flash attention (forward + custom-VJP backward).

Replaces the materialized [B, H, Tq, Tk] score tensor of the reference's
attention (reference: src/third_party/transformer.py:140-189, which computes
full softmax(QK^T)V through torch.nn.MultiheadAttention) with an online-softmax
streaming kernel: scores never leave VMEM, HBM traffic drops from
O(B*H*Tq*Tk) to O(B*H*T*D), and the QK^T / PV matmuls run on the MXU in the
input dtype with fp32 accumulation.

Design notes (TPU-first, see /opt/skills/guides/pallas_guide.md):
  * Grid (B, H, Tq/block_q); K/V for one (b, h) live whole in VMEM (speech
    encoder lengths after x4 subsampling are <= ~2k frames, so K/V blocks are
    <= 2k x 128 = 512 KB in bf16 — far under the ~16 MB VMEM budget).
  * Online softmax carries (m, l, acc) across k-blocks via fori_loop.
  * Padding is expressed as an additive key bias [B, Tk] (0 / -inf) instead
    of a dense [B, 1, Tq, Tk] mask; causality is computed from block indices
    with broadcasted_iota, so no mask tensor is ever materialized.
  * Causal attention skips k-blocks strictly above the diagonal (the loop
    bound is data-independent — derived from program_id — so the kernel stays
    a single compiled program).
  * Backward follows the standard flash-attention recipe: save only the
    logsumexp rows [B, H, Tq]; recompute P = exp(S - lse) blockwise. dK/dV
    use a (B, H, Tk/block_k) grid looping over q-blocks; dQ uses the forward
    grid looping over k-blocks. delta = rowsum(dO * O) is a cheap XLA op.

The public entry `flash_attention` takes [B, Tq, H, D] / [B, Tk, H, D]
(the layout the rest of the framework uses) plus an optional [B] kv_lengths
vector and a causal flag. Head dim is zero-padded to a multiple of 128 lanes
and sequence dims to block multiples; padded keys are masked via the bias.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 512


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,      # [1, 1, block_q, D]
    k_ref,      # [1, 1, Tk, D]
    v_ref,      # [1, 1, Tk, D]
    bias_ref,   # [1, 1, Tk]  additive key bias (0 valid / NEG_INF masked)
    o_ref,      # [1, 1, block_q, D]
    lse_ref,    # [1, 1, block_q, 1]
    *,
    sm_scale: float,
    block_k: int,
    causal: bool,
    block_q: int,
):
    qb = pl.program_id(2)
    tk = k_ref.shape[2]
    num_kb = tk // block_k

    # matmuls run in the INPUT dtype (bf16 on TPU) with fp32 accumulation —
    # casting operands to f32 would run the MXU in f32 mode, ~4-8x slower
    q = q_ref[0, 0]  # [block_q, D]

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, q_ref.shape[3]), jnp.float32)

    if causal:
        # only k-blocks whose start is <= the last query position matter
        kb_hi = jax.lax.min(
            num_kb, ((qb + 1) * block_q + block_k - 1) // block_k
        )
    else:
        kb_hi = num_kb

    def body(kb, carry):
        m_i, l_i, acc = carry
        k = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [block_q, block_k] fp32
        s = s + bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
        if causal:
            qpos = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            kpos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(kpos <= qpos, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m_f, l_f, acc = jax.lax.fori_loop(0, kb_hi, body, (m0, l0, acc0))

    # fully-masked rows (all keys padded): emit zeros, lse=+inf so that the
    # backward recompute yields p == 0 for them.
    has_any = l_f > 0.0
    safe_l = jnp.where(has_any, l_f, 1.0)
    o_ref[0, 0] = (acc / safe_l * has_any).astype(o_ref.dtype)
    lse = jnp.where(has_any, m_f + jnp.log(safe_l), -NEG_INF)
    lse_ref[0, 0] = lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref,      # [1, 1, Tq, D]
    k_ref,      # [1, 1, block_k, D]
    v_ref,      # [1, 1, block_k, D]
    bias_ref,   # [1, 1, Tk]
    do_ref,     # [1, 1, Tq, D]
    lse_ref,    # [1, 1, Tq, 1]
    delta_ref,  # [1, 1, Tq, 1]
    dk_ref,     # [1, 1, block_k, D]
    dv_ref,     # [1, 1, block_k, D]
    *,
    sm_scale: float,
    block_q: int,
    causal: bool,
    block_k: int,
):
    kb = pl.program_id(2)
    tq = q_ref.shape[2]
    num_qb = tq // block_q

    k = k_ref[0, 0]  # [block_k, D]
    v = v_ref[0, 0]
    kbias = bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]

    dk0 = jnp.zeros((block_k, k_ref.shape[3]), jnp.float32)
    dv0 = jnp.zeros((block_k, v_ref.shape[3]), jnp.float32)

    qb_lo = (kb * block_k) // block_q if causal else 0

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, 0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q), :]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q), :]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + kbias
        if causal:
            qpos = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            kpos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(kpos <= qpos, s, NEG_INF)
        p = jnp.exp(s - lse)  # [block_q, block_k]

        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * sm_scale
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk, dv = jax.lax.fori_loop(qb_lo, num_qb, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref,      # [1, 1, block_q, D]
    k_ref,      # [1, 1, Tk, D]
    v_ref,      # [1, 1, Tk, D]
    bias_ref,   # [1, 1, Tk]
    do_ref,     # [1, 1, block_q, D]
    lse_ref,    # [1, 1, block_q, 1]
    delta_ref,  # [1, 1, block_q, 1]
    dq_ref,     # [1, 1, block_q, D]
    *,
    sm_scale: float,
    block_k: int,
    causal: bool,
    block_q: int,
):
    qb = pl.program_id(2)
    tk = k_ref.shape[2]
    num_kb = tk // block_k

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    dq0 = jnp.zeros((block_q, q_ref.shape[3]), jnp.float32)

    if causal:
        kb_hi = jax.lax.min(
            num_kb, ((qb + 1) * block_q + block_k - 1) // block_k
        )
    else:
        kb_hi = num_kb

    def body(kb, dq):
        k = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
        if causal:
            qpos = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            kpos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(kpos <= qpos, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * sm_scale
        return dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, kb_hi, body, dq0)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing (operates on [B, H, T, D], padded shapes)
# ---------------------------------------------------------------------------


def _fwd_padded(q, k, v, bias, causal, sm_scale, block_q, block_k, interpret):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    grid = (b, h, tq // block_q)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, block_k=block_k, causal=causal,
        block_q=block_q,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda i, j, l: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda i, j, l: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda i, j, l: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda i, j, l: (i, j, l, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, tq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, tq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias)
    return out, lse


def _bwd_padded(
    q, k, v, bias, o, lse, do, causal, sm_scale, block_q, block_k, interpret
):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # [B, H, Tq, 1]

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, sm_scale=sm_scale, block_q=block_q, causal=causal,
        block_k=block_k,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, tk // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, tq, d), lambda i, j, l: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, tk), lambda i, j, l: (i, 0, 0)),
            pl.BlockSpec((1, 1, tq, d), lambda i, j, l: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, tq, 1), lambda i, j, l: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, tq, 1), lambda i, j, l: (i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l: (i, j, l, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, bias, do, lse, delta)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, sm_scale=sm_scale, block_k=block_k, causal=causal,
        block_q=block_q,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda i, j, l: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda i, j, l: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda i, j, l: (i, 0, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda i, j, l: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda i, j, l: (i, j, l, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda i, j, l: (i, j, l, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper on padded [B, H, T, D] arrays
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, bias, causal, sm_scale, block_q, block_k, interpret):
    out, _ = _fwd_padded(
        q, k, v, bias, causal, sm_scale, block_q, block_k, interpret
    )
    return out


def _flash_fwd(q, k, v, bias, causal, sm_scale, block_q, block_k, interpret):
    out, lse = _fwd_padded(
        q, k, v, bias, causal, sm_scale, block_q, block_k, interpret
    )
    return out, (q, k, v, bias, out, lse)


def _flash_bwd(causal, sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, bias, out, lse = res
    dq, dk, dv = _bwd_padded(
        q, k, v, bias, out, lse, g, causal, sm_scale, block_q, block_k,
        interpret,
    )
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lengths: Optional[jnp.ndarray] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Streaming masked attention.

    Args:
      q: [B, Tq, H, D].
      k, v: [B, Tk, H, D].
      kv_lengths: optional [B] int — keys >= length are masked out.
      causal: query t attends to keys <= t (requires Tq == Tk semantics).
      sm_scale: defaults to 1/sqrt(D).
    Returns: [B, Tq, H, D] in q.dtype.
    """
    if interpret is None:
        from openasr_tpu.kernels import default_platform

        interpret = default_platform() != "tpu"
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, _round_up(tq, 8))
    block_k = min(block_k, _round_up(tk, 128))
    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)
    d_p = max(_round_up(d, 128), 128)

    # [B, T, H, D] -> [B, H, T, D], zero-pad T and D
    def to_bhtd(x, t_pad):
        x = jnp.swapaxes(x, 1, 2)
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, t_pad - x.shape[2]), (0, d_p - d))
        )

    qp = to_bhtd(q, tq_p)
    kp = to_bhtd(k, tk_p)
    vp = to_bhtd(v, tk_p)

    kpos = jax.lax.broadcasted_iota(jnp.int32, (b, tk_p), 1)
    if kv_lengths is not None:
        valid = kpos < kv_lengths.astype(jnp.int32)[:, None]
    else:
        valid = kpos < tk
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    out = _flash(
        qp, kp, vp, bias, causal, sm_scale, block_q, block_k, interpret
    )
    out = jnp.swapaxes(out, 1, 2)[:, :tq, :, :d]
    return out
