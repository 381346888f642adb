"""Pallas TPU flash attention (forward + custom-VJP backward).

Replaces the materialized [B, H, Tq, Tk] score tensor of the reference's
attention (reference: src/third_party/transformer.py:140-189, which computes
full softmax(QK^T)V through torch.nn.MultiheadAttention) with an online-softmax
streaming kernel: scores never leave VMEM, HBM traffic drops from
O(B*H*Tq*Tk) to O(B*H*T*D), and the QK^T / PV matmuls run on the MXU in the
input dtype with fp32 accumulation (casting operands to f32 would put the MXU
in f32 mode, ~4-8x slower — measured).

Design notes (TPU-first, see /opt/skills/guides/pallas_guide.md):
  * The reduction dimension lives IN THE GRID (grid = (B, H, Qblocks,
    Kblocks) with k innermost), so Mosaic double-buffers the K/V block
    fetches behind the matmuls instead of serializing them in an in-kernel
    loop.  Online-softmax state (m, l, acc) is carried across k-steps in
    VMEM scratch, initialized at kb==0 and finalized into the output block
    at the last kb (standard TPU flash-attention structure).
  * Padding is an additive key bias [B, 1, Tk] (0 / -inf); causality is
    computed from block indices with broadcasted_iota — no mask tensor is
    materialized, and fully-above-diagonal blocks skip their compute via
    pl.when.
  * Backward follows the flash recipe: save only the logsumexp rows
    [B, H, Tq, 1]; recompute P = exp(S - lse) blockwise. dK/dV use a
    (B, H, Kblocks, Qblocks) grid accumulating in scratch; dQ uses the
    forward grid. delta = rowsum(dO * O) is a cheap XLA op.

The public entry `flash_attention` takes [B, Tq, H, D] / [B, Tk, H, D]
(the layout the rest of the framework uses) plus an optional [B] kv_lengths
vector and a causal flag. Sequence dims are zero-padded to block multiples
(padded keys masked via the bias); the head dim stays native when the lane
tiling allows — a full-dim block is always legal and e.g. D=64 halves HBM
traffic vs padding to 128.
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

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _causal_mask(s, qb, kb, block_q, block_k):
    qpos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    kpos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(kpos <= qpos, s, NEG_INF)


# ---------------------------------------------------------------------------
# Forward kernel: grid (B, H, Qblocks, Kblocks), k innermost
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,      # [1, 1, block_q, D]
    k_ref,      # [1, 1, block_k, D]
    v_ref,      # [1, 1, block_k, D]
    bias_ref,   # [1, 1, block_k]
    o_ref,      # [1, 1, block_q, D]
    lse_ref,    # [1, 1, block_q, 1]
    m_s,        # scratch [block_q, 1] f32
    l_s,        # scratch [block_q, 1] f32
    acc_s,      # scratch [block_q, D] f32
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
):
    qb = pl.program_id(2)
    kb = pl.program_id(3)
    num_kb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    # a block is live unless it is entirely above the causal diagonal
    live = (kb * block_k <= (qb + 1) * block_q - 1) if causal else True

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [block_q, block_k] fp32
        s = s + bias_ref[0, 0][None, :]
        if causal:
            s = _causal_mask(s, qb, kb, block_q, block_k)

        m_prev = m_s[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # guard rows with NO valid key so far: s == m_new == NEG_INF would
        # give exp(0) = 1 per masked entry and corrupt l/acc (then the
        # has_any finalize test).  Real masked entries underflow to 0 once
        # any valid key raised m_new.
        p = jnp.where(s > 0.5 * NEG_INF, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        m_s[:] = m_new
        l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_s[:] = acc_s[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        l_f = l_s[:]
        m_f = m_s[:]
        # fully-masked rows (all keys padded): zeros out, lse=+inf so the
        # backward recompute yields p == 0 for them.
        has_any = l_f > 0.0
        safe_l = jnp.where(has_any, l_f, 1.0)
        o_ref[0, 0] = (acc_s[:] / safe_l * has_any).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.where(has_any, m_f + jnp.log(safe_l), -NEG_INF)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref,      # [1, 1, block_q, D]
    k_ref,      # [1, 1, block_k, D]
    v_ref,      # [1, 1, block_k, D]
    bias_ref,   # [1, 1, block_k]
    do_ref,     # [1, 1, block_q, D]
    lse_ref,    # [1, 1, block_q, 1]
    delta_ref,  # [1, 1, block_q, 1]
    dk_ref,     # [1, 1, block_k, D]
    dv_ref,     # [1, 1, block_k, D]
    dk_s,       # scratch [block_k, D] f32
    dv_s,       # scratch [block_k, D] f32
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
):
    kb = pl.program_id(2)
    qb = pl.program_id(3)
    num_qb = pl.num_programs(3)

    @pl.when(qb == 0)
    def _init():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    live = ((qb + 1) * block_q - 1 >= kb * block_k) if causal else True

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + bias_ref[0, 0][None, :]
        if causal:
            s = _causal_mask(s, qb, kb, block_q, block_k)
        p = jnp.exp(s - lse)  # [block_q, block_k]

        dv_s[:] = dv_s[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * sm_scale
        dk_s[:] = dk_s[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qb == num_qb - 1)
    def _finalize():
        dk_ref[0, 0] = dk_s[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_s[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref,      # [1, 1, block_q, D]
    k_ref,      # [1, 1, block_k, D]
    v_ref,      # [1, 1, block_k, D]
    bias_ref,   # [1, 1, block_k]
    do_ref,     # [1, 1, block_q, D]
    lse_ref,    # [1, 1, block_q, 1]
    delta_ref,  # [1, 1, block_q, 1]
    dq_ref,     # [1, 1, block_q, D]
    dq_s,       # scratch [block_q, D] f32
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
):
    qb = pl.program_id(2)
    kb = pl.program_id(3)
    num_kb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        dq_s[:] = jnp.zeros_like(dq_s)

    live = (kb * block_k <= (qb + 1) * block_q - 1) if causal else True

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + bias_ref[0, 0][None, :]
        if causal:
            s = _causal_mask(s, qb, kb, block_q, block_k)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * sm_scale
        dq_s[:] = dq_s[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        dq_ref[0, 0] = dq_s[:].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing (operates on [B, H, T, D], padded shapes)
# ---------------------------------------------------------------------------


def _fwd_padded(q, k, v, bias, causal, sm_scale, block_q, block_k, interpret):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    grid = (b, h, tq // block_q, tk // block_k)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_k=block_k,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l, m: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l, m: (i, j, m, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l, m: (i, j, m, 0)),
            pl.BlockSpec((1, 1, block_k), lambda i, j, l, m: (i, 0, m)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l, m: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda i, j, l, m: (i, j, l, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, tq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, tq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
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
        _bwd_dkv_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_k=block_k,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, tk // block_k, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l, m: (i, j, m, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l, m: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l, m: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_k), lambda i, j, l, m: (i, 0, l)),
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l, m: (i, j, m, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda i, j, l, m: (i, j, m, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda i, j, l, m: (i, j, m, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l, m: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l, m: (i, j, l, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias, do, lse, delta)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_k=block_k,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, tq // block_q, tk // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l, m: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l, m: (i, j, m, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda i, j, l, m: (i, j, m, 0)),
            pl.BlockSpec((1, 1, block_k), lambda i, j, l, m: (i, 0, m)),
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, l, m: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda i, j, l, m: (i, j, l, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda i, j, l, m: (i, j, l, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda i, j, l, m: (i, j, l, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
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
    # head dim: a full-dim block is always tiling-legal; keep native lane
    # widths (64/32) instead of padding to 128 — halves/quarters HBM traffic
    d_p = d if (d % 128 == 0 or d in (64, 32)) else max(_round_up(d, 128), 128)

    # [B, T, H, D] -> [B, H, T, D], zero-pad T (and D if needed)
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
