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

# With all heads batched into one grid program, the per-head [block_q,
# block_k] f32 temporaries of the unrolled head loop coexist in scoped
# VMEM; block_q 128 keeps 8 heads under the 16 MB budget.
DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 512


from openasr_tpu.kernels._util import cdiv as _cdiv, round_up as _round_up


def _causal_mask(s, qb, kb, block_q, block_k):
    qpos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    kpos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(kpos <= qpos, s, NEG_INF)


# ---------------------------------------------------------------------------
# Stateless attention-probability dropout
#
# The reference applies dropout to the softmax weights during training
# (reference: src/third_party/transformer.py:161-189). Inside a streaming
# kernel the mask for a (q-block, k-block) tile must be regenerated bit-
# identically by the forward pass and BOTH backward kernels, which visit the
# tiles in different grid orders.  A stateful PRNG can't do that; instead the
# keep decision is a pure hash of (seed, batch, head, global q pos, global
# k pos) — a murmur3-style integer finalizer evaluated elementwise on the
# VPU.  The mask is therefore independent of block sizes and grid order, and
# `attention_dropout_mask` below reproduces it in plain XLA for parity tests.
# ---------------------------------------------------------------------------

_GOLDEN = 0x9E3779B9  # 2^32 / golden ratio, decorrelates the seed/bh mix


def _hash_u32(x):
    """murmur3 fmix32: full avalanche on uint32."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _keep_from_positions(seed, bh, qpos, kpos, keep_thresh):
    """seed/bh: uint32 scalars; qpos/kpos: uint32 arrays.
    Returns bool keep mask (True = keep)."""
    x = qpos * jnp.uint32(2654435761) + kpos
    x = x ^ (seed + bh * jnp.uint32(_GOLDEN))
    return _hash_u32(x) < keep_thresh


def _keep_threshold(dropout_rate: float) -> jnp.uint32:
    return jnp.uint32(
        min(int(round((1.0 - dropout_rate) * 4294967296.0)), 4294967295)
    )


def attention_dropout_mask(
    seed, b: int, h: int, tq: int, tk: int, dropout_rate: float
) -> jnp.ndarray:
    """Pure-XLA replica of the in-kernel dropout mask: bool [B, H, Tq, Tk],
    True = keep.  Used by parity tests; the kernel never materializes it."""
    seed = jnp.asarray(seed, jnp.uint32).reshape(())
    bh = (
        jnp.arange(b, dtype=jnp.uint32)[:, None] * jnp.uint32(h)
        + jnp.arange(h, dtype=jnp.uint32)[None, :]
    )[:, :, None, None]
    qpos = jnp.arange(tq, dtype=jnp.uint32)[None, None, :, None]
    kpos = jnp.arange(tk, dtype=jnp.uint32)[None, None, None, :]
    return _keep_from_positions(
        seed, bh, qpos, kpos, _keep_threshold(dropout_rate)
    )


def _block_keep(seed_ref, bh, qb, kb, block_q, block_k, shape, dropout_rate):
    """In-kernel keep mask for the (batch*H + head, qb, kb) tile.  `bh` must
    be read from program_id at kernel top level (program_id does not lower
    inside pl.when bodies in interpret mode)."""
    qpos = (qb * block_q + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
    kpos = (kb * block_k + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    return _keep_from_positions(
        seed_ref[0],
        bh.astype(jnp.uint32),
        qpos.astype(jnp.uint32),
        kpos.astype(jnp.uint32),
        _keep_threshold(dropout_rate),
    )


# ---------------------------------------------------------------------------
# Forward kernel: grid (B, Qblocks, Kblocks), k innermost, ALL HEADS per
# program.  The per-grid-program fixed cost (~1 us on this hardware)
# dominated head-sized tiles — batching the H loop into one program cuts
# program count by H and amortizes it (device-measured; see
# flash_attention_min_len).
# ---------------------------------------------------------------------------


def _fwd_kernel(
    seed_ref,   # SMEM [1] uint32 (ignored when dropout_rate == 0)
    q_ref,      # [1, H, block_q, D]
    k_ref,      # [1, H, block_k, D]
    v_ref,      # [1, H, block_k, D]
    bias_ref,   # [1, 1, block_k]
    o_ref,      # [1, H, block_q, D]
    lse_ref,    # [1, H, block_q, 1]
    m_s,        # scratch [H, block_q, 1] f32
    l_s,        # scratch [H, block_q, 1] f32
    acc_s,      # scratch [H, block_q, D] f32
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    dropout_rate: float,
    nheads: int,
):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    b_idx = pl.program_id(0)

    @pl.when(kb == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    # a block is live unless it is entirely above the causal diagonal
    live = (kb * block_k <= (qb + 1) * block_q - 1) if causal else True

    @pl.when(live)
    def _compute():
        bias_row = bias_ref[0, 0][None, :]
        for h in range(nheads):
            q = q_ref[0, h]
            k = k_ref[0, h]
            v = v_ref[0, h]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [block_q, block_k] fp32
            s = s + bias_row
            if causal:
                s = _causal_mask(s, qb, kb, block_q, block_k)

            m_prev = m_s[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            # guard rows with NO valid key so far: s == m_new == NEG_INF
            # would give exp(0) = 1 per masked entry and corrupt l/acc
            # (then the has_any finalize test).  Real masked entries
            # underflow to 0 once any valid key raised m_new.
            p = jnp.where(s > 0.5 * NEG_INF, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            m_s[h] = m_new
            # dropout hits the NORMALIZED weights, so l (the softmax
            # denominator) accumulates the undropped p while acc gets the
            # dropped+rescaled one.
            l_s[h] = l_s[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            if dropout_rate > 0.0:
                keep = _block_keep(
                    seed_ref, b_idx * nheads + h, qb, kb, block_q, block_k,
                    p.shape, dropout_rate,
                )
                p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
            acc_s[h] = acc_s[h] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        for h in range(nheads):
            l_f = l_s[h]
            m_f = m_s[h]
            # fully-masked rows (all keys padded): zeros out, lse=+inf so
            # the backward recompute yields p == 0 for them.
            has_any = l_f > 0.0
            safe_l = jnp.where(has_any, l_f, 1.0)
            o_ref[0, h] = (acc_s[h] / safe_l * has_any).astype(o_ref.dtype)
            lse_ref[0, h] = jnp.where(
                has_any, m_f + jnp.log(safe_l), -NEG_INF
            )


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    seed_ref,   # SMEM [1] uint32
    q_ref,      # [1, H, block_q, D]
    k_ref,      # [1, H, block_k, D]
    v_ref,      # [1, H, block_k, D]
    bias_ref,   # [1, 1, block_k]
    do_ref,     # [1, H, block_q, D]
    lse_ref,    # [1, H, block_q, 1]
    delta_ref,  # [1, H, block_q, 1]
    dk_ref,     # [1, H, block_k, D]
    dv_ref,     # [1, H, block_k, D]
    dk_s,       # scratch [H, block_k, D] f32
    dv_s,       # scratch [H, block_k, D] f32
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    dropout_rate: float,
    nheads: int,
):
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    num_qb = pl.num_programs(2)
    b_idx = pl.program_id(0)

    @pl.when(qb == 0)
    def _init():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    live = ((qb + 1) * block_q - 1 >= kb * block_k) if causal else True

    @pl.when(live)
    def _compute():
        bias_row = bias_ref[0, 0][None, :]
        for h in range(nheads):
            q = q_ref[0, h]
            k = k_ref[0, h]
            v = v_ref[0, h]
            do = do_ref[0, h]
            lse = lse_ref[0, h]
            delta = delta_ref[0, h]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale + bias_row
            if causal:
                s = _causal_mask(s, qb, kb, block_q, block_k)
            p = jnp.exp(s - lse)  # [block_q, block_k]

            # with O = (P o D) V (D = keep/(1-rate)):
            #   dV = (P o D)^T dO;   dP = (dO V^T) o D;
            #   dS = P o (dP - delta), delta = rowsum(dO o O) unchanged.
            if dropout_rate > 0.0:
                keep = _block_keep(
                    seed_ref, b_idx * nheads + h, qb, kb, block_q,
                    block_k, p.shape, dropout_rate,
                )
                p_drop = jnp.where(
                    keep, p * (1.0 / (1.0 - dropout_rate)), 0.0
                )
            else:
                p_drop = p

            dv_s[h] = dv_s[h] + jax.lax.dot_general(
                p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if dropout_rate > 0.0:
                dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_rate)), 0.0)
            ds = p * (dp - delta) * sm_scale
            dk_s[h] = dk_s[h] + jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(qb == num_qb - 1)
    def _finalize():
        for h in range(nheads):
            dk_ref[0, h] = dk_s[h].astype(dk_ref.dtype)
            dv_ref[0, h] = dv_s[h].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    seed_ref,   # SMEM [1] uint32
    q_ref,      # [1, H, block_q, D]
    k_ref,      # [1, H, block_k, D]
    v_ref,      # [1, H, block_k, D]
    bias_ref,   # [1, 1, block_k]
    do_ref,     # [1, H, block_q, D]
    lse_ref,    # [1, H, block_q, 1]
    delta_ref,  # [1, H, block_q, 1]
    dq_ref,     # [1, H, block_q, D]
    dq_s,       # scratch [H, block_q, D] f32
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    dropout_rate: float,
    nheads: int,
):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    b_idx = pl.program_id(0)

    @pl.when(kb == 0)
    def _init():
        dq_s[:] = jnp.zeros_like(dq_s)

    live = (kb * block_k <= (qb + 1) * block_q - 1) if causal else True

    @pl.when(live)
    def _compute():
        bias_row = bias_ref[0, 0][None, :]
        for h in range(nheads):
            q = q_ref[0, h]
            k = k_ref[0, h]
            v = v_ref[0, h]
            do = do_ref[0, h]
            lse = lse_ref[0, h]
            delta = delta_ref[0, h]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale + bias_row
            if causal:
                s = _causal_mask(s, qb, kb, block_q, block_k)
            p = jnp.exp(s - lse)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if dropout_rate > 0.0:
                keep = _block_keep(
                    seed_ref, b_idx * nheads + h, qb, kb, block_q,
                    block_k, p.shape, dropout_rate,
                )
                dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_rate)), 0.0)
            ds = p * (dp - delta) * sm_scale
            dq_s[h] = dq_s[h] + jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        for h in range(nheads):
            dq_ref[0, h] = dq_s[h].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing (operates on [B, H, T, D], padded shapes)
# ---------------------------------------------------------------------------


_SEED_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_padded(q, k, v, bias, seed, causal, sm_scale, block_q, block_k,
                dropout_rate, interpret):
    # All shapes/grids are derived INSIDE core from its (possibly local)
    # argument shapes: under SPMD the partitioner (kernels/partition.py)
    # runs core per-shard with the batch/head dims divided across chips.
    def core(seed, q, k, v, bias):
        b, h, tq, d = q.shape
        tk = k.shape[2]
        grid = (b, tq // block_q, tk // block_k)
        kernel = functools.partial(
            _fwd_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q,
            block_k=block_k, dropout_rate=dropout_rate, nheads=h,
        )
        out, lse = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _SEED_SPEC,
                pl.BlockSpec((1, h, block_q, d), lambda i, l, m: (i, 0, l, 0)),
                pl.BlockSpec((1, h, block_k, d), lambda i, l, m: (i, 0, m, 0)),
                pl.BlockSpec((1, h, block_k, d), lambda i, l, m: (i, 0, m, 0)),
                pl.BlockSpec((1, 1, block_k), lambda i, l, m: (i, 0, m)),
            ],
            out_specs=[
                pl.BlockSpec((1, h, block_q, d), lambda i, l, m: (i, 0, l, 0)),
                pl.BlockSpec((1, h, block_q, 1), lambda i, l, m: (i, 0, l, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, tq, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, tq, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((h, block_q, 1), jnp.float32),
                pltpu.VMEM((h, block_q, 1), jnp.float32),
                pltpu.VMEM((h, block_q, d), jnp.float32),
            ],
            interpret=interpret,
        )(seed, q, k, v, bias)
        return out, lse

    from openasr_tpu.kernels.partition import maybe_partition

    core_p = maybe_partition(
        core,
        in_specs=[
            ("s",),
            ("b", "h", "tq", "d"),
            ("b", "h", "tk", "d"),
            ("b", "h", "tk", "d"),
            ("b", "bone", "tk"),
        ],
        out_specs=[("b", "h", "tq", "d"), ("b", "h", "tq", "lone")],
        shardable={"b", "h"},
        seed_arg=0,
    )
    out, lse = core_p(seed, q, k, v, bias)
    return out, lse


def _bwd_padded(
    q, k, v, bias, seed, o, lse, do, causal, sm_scale, block_q, block_k,
    dropout_rate, interpret
):
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # [B, H, Tq, 1]

    # Shapes/grids derived inside core: under SPMD (kernels/partition.py)
    # core runs on the local batch/head shard.
    def core(seed, q, k, v, bias, do, lse, delta):
        b, h, tq, d = q.shape
        tk = k.shape[2]
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, dropout_rate=dropout_rate,
            nheads=h,
        )
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid=(b, tk // block_k, tq // block_q),
            in_specs=[
                _SEED_SPEC,
                pl.BlockSpec((1, h, block_q, d), lambda i, l, m: (i, 0, m, 0)),
                pl.BlockSpec((1, h, block_k, d), lambda i, l, m: (i, 0, l, 0)),
                pl.BlockSpec((1, h, block_k, d), lambda i, l, m: (i, 0, l, 0)),
                pl.BlockSpec((1, 1, block_k), lambda i, l, m: (i, 0, l)),
                pl.BlockSpec((1, h, block_q, d), lambda i, l, m: (i, 0, m, 0)),
                pl.BlockSpec((1, h, block_q, 1), lambda i, l, m: (i, 0, m, 0)),
                pl.BlockSpec((1, h, block_q, 1), lambda i, l, m: (i, 0, m, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, h, block_k, d), lambda i, l, m: (i, 0, l, 0)),
                pl.BlockSpec((1, h, block_k, d), lambda i, l, m: (i, 0, l, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(k.shape, k.dtype),
                jax.ShapeDtypeStruct(v.shape, v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((h, block_k, d), jnp.float32),
                pltpu.VMEM((h, block_k, d), jnp.float32),
            ],
            interpret=interpret,
        )(seed, q, k, v, bias, do, lse, delta)

        dq_kernel = functools.partial(
            _bwd_dq_kernel, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, dropout_rate=dropout_rate,
            nheads=h,
        )
        dq = pl.pallas_call(
            dq_kernel,
            grid=(b, tq // block_q, tk // block_k),
            in_specs=[
                _SEED_SPEC,
                pl.BlockSpec((1, h, block_q, d), lambda i, l, m: (i, 0, l, 0)),
                pl.BlockSpec((1, h, block_k, d), lambda i, l, m: (i, 0, m, 0)),
                pl.BlockSpec((1, h, block_k, d), lambda i, l, m: (i, 0, m, 0)),
                pl.BlockSpec((1, 1, block_k), lambda i, l, m: (i, 0, m)),
                pl.BlockSpec((1, h, block_q, d), lambda i, l, m: (i, 0, l, 0)),
                pl.BlockSpec((1, h, block_q, 1), lambda i, l, m: (i, 0, l, 0)),
                pl.BlockSpec((1, h, block_q, 1), lambda i, l, m: (i, 0, l, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, h, block_q, d), lambda i, l, m: (i, 0, l, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            scratch_shapes=[pltpu.VMEM((h, block_q, d), jnp.float32)],
            interpret=interpret,
        )(seed, q, k, v, bias, do, lse, delta)
        return dq, dk, dv

    from openasr_tpu.kernels.partition import maybe_partition

    core_p = maybe_partition(
        core,
        in_specs=[
            ("s",),
            ("b", "h", "tq", "d"),
            ("b", "h", "tk", "d"),
            ("b", "h", "tk", "d"),
            ("b", "bone", "tk"),
            ("b", "h", "tq", "d"),
            ("b", "h", "tq", "lone"),
            ("b", "h", "tq", "done"),
        ],
        out_specs=[
            ("b", "h", "tq", "d"),
            ("b", "h", "tk", "d"),
            ("b", "h", "tk", "d"),
        ],
        shardable={"b", "h"},
        seed_arg=0,
    )
    return core_p(seed, q, k, v, bias, do, lse, delta)


# ---------------------------------------------------------------------------
# custom_vjp wrapper on padded [B, H, T, D] arrays
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash(q, k, v, bias, seed, causal, sm_scale, block_q, block_k,
           dropout_rate, interpret):
    out, _ = _fwd_padded(
        q, k, v, bias, seed, causal, sm_scale, block_q, block_k,
        dropout_rate, interpret,
    )
    return out


def _flash_fwd(q, k, v, bias, seed, causal, sm_scale, block_q, block_k,
               dropout_rate, interpret):
    out, lse = _fwd_padded(
        q, k, v, bias, seed, causal, sm_scale, block_q, block_k,
        dropout_rate, interpret,
    )
    return out, (q, k, v, bias, seed, out, lse)


def _flash_bwd(causal, sm_scale, block_q, block_k, dropout_rate, interpret,
               res, g):
    q, k, v, bias, seed, out, lse = res
    dq, dk, dv = _bwd_padded(
        q, k, v, bias, seed, out, lse, g, causal, sm_scale, block_q, block_k,
        dropout_rate, interpret,
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _vmem_guarded_blocks(
    h: int, d_p: int, block_q: int, block_k: int, dropout_rate: float
):
    """VMEM guard: the default 128x512 blocks are sized for h*d_p <= 512
    (e.g. 8 heads x 64 dim) — the all-heads-per-program design keeps
    [H, block, D] blocks and f32 scratch resident, so a larger head
    budget must shrink the k block (then the q block) proportionally or
    Mosaic fails compilation on the ~16 MB scoped-VMEM budget.  In-kernel
    dropout adds per-head [block_q, block_k] keep-mask temporaries on
    top: at exactly h*d_p == 512 the dkv backward measured 56 KB over
    the 16 MB limit on a v5e, so the dropout path halves block_k one
    step earlier (the guard denominator drops to 384)."""
    denom = 384 if dropout_rate > 0.0 else 512
    over = (h * d_p + denom - 1) // denom
    while over > 1 and block_k > 128:
        block_k //= 2
        over = (over + 1) // 2
    while over > 1 and block_q > 32:
        block_q //= 2
        over = (over + 1) // 2
    return block_q, block_k


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lengths: Optional[jnp.ndarray] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Streaming masked attention.

    Args:
      q: [B, Tq, H, D].
      k, v: [B, Tk, H, D].
      kv_lengths: optional [B] int — keys >= length are masked out.
      causal: query t attends to keys <= t (requires Tq == Tk semantics).
      sm_scale: defaults to 1/sqrt(D).
      dropout_rate: train-time dropout on the softmax weights (the
        reference applies it inside MultiheadAttention,
        src/third_party/transformer.py:161-189). Requires `dropout_seed`,
        a uint32 scalar/1-vector; the mask is the stateless positional
        hash reproduced by `attention_dropout_mask`.
    Returns: [B, Tq, H, D] in q.dtype.
    """
    if interpret is None:
        from openasr_tpu.kernels import default_platform

        interpret = default_platform() != "tpu"
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0:
        assert dropout_seed is not None, "dropout_rate > 0 needs dropout_seed"
        seed = jnp.asarray(dropout_seed, jnp.uint32).reshape((1,))
    else:
        seed = jnp.zeros((1,), jnp.uint32)

    # head dim: a full-dim block is always tiling-legal; keep native lane
    # widths (64/32) instead of padding to 128 — halves/quarters HBM traffic
    d_p = d if (d % 128 == 0 or d in (64, 32)) else max(_round_up(d, 128), 128)

    block_q, block_k = _vmem_guarded_blocks(
        h, d_p, block_q, block_k, dropout_rate
    )
    block_q = min(block_q, _round_up(tq, 8))
    block_k = min(block_k, _round_up(tk, 128))
    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)

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
        qp, kp, vp, bias, seed, causal, sm_scale, block_q, block_k,
        dropout_rate, interpret,
    )
    out = jnp.swapaxes(out, 1, 2)[:, :tq, :, :d]
    return out
