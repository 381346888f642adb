"""Transformer building blocks (flax.linen), post-LN, with KV-cached decoding.

Capability parity with the reference's vendored pre-1.2 torch.nn.Transformer
stack (reference: src/third_party/transformer.py:254-408): post-LayerNorm
residual blocks, relu/gelu/glu feed-forward activations, padding + causal
masks.  Re-designed for TPU decoding: the decoder layer supports an explicit
functional KV cache so autoregressive steps are O(L) instead of the
reference's full re-forward per step (reference: src/blocks/decoders.py:83-84
had no cache, making beam search O(L^3)).

Positional encoding reproduces the reference exactly, including its
double-scaling quirk: `PositionalEncoding.forward` multiplies its input by
sqrt(d_model) (reference: src/blocks/position.py:26-33), and the decoder
ALSO pre-scales embeddings by sqrt(d_model) (reference:
src/blocks/decoders.py:55,70), so decoder embeddings are effectively scaled
by d_model.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from openasr_tpu.ops.masks import causal_bias, combine_bias, padding_bias
from openasr_tpu.parallel.mesh import shard_time

Dtype = Any

XAVIER_UNIFORM = nn.initializers.xavier_uniform()


class LayerNorm(nn.Module):
    """Drop-in replacement for flax nn.LayerNorm (same param names/shapes:
    'scale'/'bias' [D] f32; same math: f32 fast-variance statistics, output
    cast to `dtype`) that routes through the one-pass Pallas kernel
    (kernels/layer_norm.py) on TPU.  Small row counts — e.g. the [B, 1, D]
    tensors of a KV-cached decode step inside lax.scan — stay on the plain
    XLA formula, where a kernel launch would cost more than it saves."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32
    min_rows: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from openasr_tpu.kernels import fused_layer_norm_enabled
        from openasr_tpu.kernels.layer_norm import (
            fused_layer_norm,
            layer_norm_reference,
        )

        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        x = jnp.asarray(x, self.dtype)
        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if fused_layer_norm_enabled() and rows >= self.min_rows:
            return fused_layer_norm(x, scale, bias, self.epsilon)
        return layer_norm_reference(x, scale, bias, self.epsilon)


@lru_cache(maxsize=8)
def _pe_table(d_model: int, max_len: int) -> np.ndarray:
    """Sin/cos table [max_len, d_model] (reference: src/blocks/position.py:17-24)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * -(math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def positional_encoding(
    x: jnp.ndarray, max_len: int = 5000, offset: int = 0
) -> jnp.ndarray:
    """x * sqrt(d) + PE[offset : offset+T]  (applied per the reference's
    `PositionalEncoding.forward`, src/blocks/position.py:26-33)."""
    d_model = x.shape[-1]
    t = x.shape[-2]
    pe = jnp.asarray(_pe_table(d_model, max_len))
    pe_slice = jax.lax.dynamic_slice_in_dim(pe, offset, t, axis=0)
    return x * (d_model ** 0.5) + pe_slice.astype(x.dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    return_probs: bool = False,
) -> jnp.ndarray:
    """q [B,Tq,H,D], k/v [B,Tk,H,D], bias [B|1, 1|H, Tq, Tk] -> [B,Tq,H,D].

    Softmax in fp32 for stability; matmuls hit the MXU in the input dtype.
    return_probs additionally returns the [B,H,Tq,Tk] attention weights.
    """
    depth = q.shape[-1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(depth)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    if return_probs:
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v), probs
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class MultiHeadAttention(nn.Module):
    """MHA with separate q/k/v/out projections and optional functional KV
    cache (cache = dict(k=[B,Tmax,H,D], v=[B,Tmax,H,D]))."""

    d_model: int
    nhead: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.nhead == 0
        head_dim = self.d_model // self.nhead
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            features=(self.nhead, head_dim),
            axis=-1,
            kernel_init=XAVIER_UNIFORM,
            dtype=self.dtype,
            name=name,
        )
        self.q_proj = dense("q")
        self.k_proj = dense("k")
        self.v_proj = dense("v")
        self.out_proj = nn.DenseGeneral(
            features=self.d_model,
            axis=(-2, -1),
            kernel_init=XAVIER_UNIFORM,
            dtype=self.dtype,
            name="out",
        )

    def __call__(
        self,
        inputs_q: jnp.ndarray,
        inputs_kv: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        kv_lengths: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        """Either pass a dense additive `bias` [B|1, 1|H, Tq, Tk], or the
        structured form (`kv_lengths` [B] key-padding + `causal` flag). The
        structured form routes through the Pallas flash-attention kernel on
        TPU (kernels/flash_attention.py); otherwise an equivalent dense bias
        is built and the XLA einsum path runs."""
        from openasr_tpu.kernels import (
            flash_attention,
            flash_attention_enabled,
            flash_attention_forced,
            flash_attention_max_len,
            flash_attention_min_len,
        )

        q = self.q_proj(inputs_q)
        k = self.k_proj(inputs_kv)
        v = self.v_proj(inputs_kv)
        structured = bias is None and (kv_lengths is not None or causal)
        seq_len = max(q.shape[1], k.shape[1])
        max_len = flash_attention_max_len()
        # an explicit set_flash_attention(True) / OPENASR_FLASH_ATTENTION=1
        # bypasses the measured dense/flash crossover routing
        within = flash_attention_forced() or (
            seq_len >= flash_attention_min_len()
            and (max_len <= 0 or seq_len <= max_len)
        )
        if structured and within and flash_attention_enabled():
            dropping = self.dropout_rate > 0.0 and not deterministic
            seed = None
            if dropping:
                # fold the flax dropout rng into a uint32 seed for the
                # kernel's stateless positional-hash mask
                seed = jax.random.bits(
                    self.make_rng("dropout"), (1,), jnp.uint32
                )
            out = flash_attention(
                q, k, v, kv_lengths=kv_lengths, causal=causal,
                dropout_rate=self.dropout_rate if dropping else 0.0,
                dropout_seed=seed,
            )
            return self.out_proj(out)
        if structured:
            parts = []
            if kv_lengths is not None:
                parts.append(padding_bias(kv_lengths, k.shape[1]))
            if causal:
                parts.append(causal_bias(q.shape[1]))
            bias = combine_bias(*parts)
        rng = (
            self.make_rng("dropout")
            if (self.dropout_rate > 0.0 and not deterministic)
            else None
        )
        out, probs = dot_product_attention(
            q, k, v, bias, self.dropout_rate, deterministic, rng,
            return_probs=True,
        )
        # Attention-map capture (reference: third_party/transformer.py
        # return_atten, used for the README's TensorBoard visualizations).
        # sow is dead code unless apply() passes mutable=['intermediates']
        # (Framework.attention_maps) — XLA removes it from the train step.
        self.sow("intermediates", "attn", probs.astype(jnp.float32))
        return self.out_proj(out)

    def project_kv(self, inputs_kv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute K/V (cross-attention cache for decoding)."""
        return self.k_proj(inputs_kv), self.v_proj(inputs_kv)

    def attend_step(
        self,
        x_t: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Single-query attention against precomputed K/V.
        x_t [B, 1, D_in]; k/v [B, Tk, H, D]."""
        q = self.q_proj(x_t)
        out = dot_product_attention(q, k, v, bias)
        return self.out_proj(out)

    def append_kv(
        self, x_t: jnp.ndarray, cache_k: jnp.ndarray, cache_v: jnp.ndarray, index
    ):
        """Write this step's K/V into the cache at `index`; returns updated
        caches."""
        k_t = self.k_proj(x_t)  # [B, 1, H, D]
        v_t = self.v_proj(x_t)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_t.astype(cache_k.dtype), index, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_t.astype(cache_v.dtype), index, axis=1)
        return cache_k, cache_v


class FeedForward(nn.Module):
    """Position-wise FFN with relu/gelu/glu (glu doubles linear1's width,
    reference: src/third_party/transformer.py:279-281,400-408)."""

    d_model: int
    dim_feedforward: int
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        width = (
            2 * self.dim_feedforward
            if self.activation == "glu"
            else self.dim_feedforward
        )
        h = nn.Dense(
            width, kernel_init=XAVIER_UNIFORM, dtype=self.dtype, name="linear1"
        )(x)
        if self.activation == "relu":
            h = nn.relu(h)
        elif self.activation == "gelu":
            h = nn.gelu(h, approximate=False)
        elif self.activation == "glu":
            a, b = jnp.split(h, 2, axis=-1)
            h = a * nn.sigmoid(b)
        else:
            raise ValueError(f"Unknown activation {self.activation}")
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        # NOTE (perf, measured on v5e): leave the glu gate + dropout
        # FUSED into the linear2 matmul.  An optimization_barrier here
        # (forcing the activation to materialize first) was A/B'd both
        # ways in round 5: the fused FFN2 kernel runs at ~46% of MXU
        # peak, but that is its composite roofline (matmul FLOPs + the
        # mandatory 2x-wide gate-input read in one pass) — the barrier
        # made the wide d1024 lane 3 ms/step SLOWER (66.4 -> 69.6) and
        # the flagship 2 ms slower, because the extra materialized
        # write+read costs more than the fusion's prologue.
        return nn.Dense(
            self.d_model, kernel_init=XAVIER_UNIFORM, dtype=self.dtype,
            name="linear2",
        )(h)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (reference: src/third_party/transformer.py:254-318).

    `chunk_step` is the cached streaming path (streaming.py): attend the
    current chunk's queries against [cached K/V ++ this chunk's K/V] —
    with the chunk-attention training bias (ops/masks.py:chunk_bias) the
    result is bit-identical to the batch `__call__`."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    dtype: Dtype = jnp.float32
    # encoder.moe: replace this layer's dense FFN with a top-k routed
    # mixture of experts (models/moe.py); 0 = dense.  Expert tables shard
    # over the mesh's 'data' axis (expert parallelism, parallel/mesh.py)
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity: float = 1.25
    moe_router: str = "topk"

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout_rate, self.dtype,
            name="self_attn",
        )
        if self.moe_experts > 0:
            from openasr_tpu.models.moe import MoEFeedForward

            self.ffn = MoEFeedForward(
                self.d_model, self.dim_feedforward, self.moe_experts,
                self.moe_top_k, self.moe_capacity, self.activation,
                self.dropout_rate, self.moe_router, self.dtype,
                name="moe_ffn",
            )
        else:
            self.ffn = FeedForward(
                self.d_model, self.dim_feedforward, self.activation,
                self.dropout_rate, self.dtype, name="ffn",
            )
        self.norm1 = LayerNorm(dtype=self.dtype, name="norm1")
        self.norm2 = LayerNorm(dtype=self.dtype, name="norm2")

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        kv_lengths: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        attn = self.self_attn(
            x, x, bias, deterministic, kv_lengths=kv_lengths, causal=causal
        )
        # shard_time: under sequence parallelism the residual add /
        # dropout / LayerNorm regions hold T/|model| rows per chip
        # (no-op otherwise — see parallel/mesh.py)
        x = shard_time(
            x + nn.Dropout(self.dropout_rate, deterministic=deterministic)(attn)
        )
        x = self.norm1(x)
        if self.moe_experts > 0:
            pad = (
                (jnp.arange(x.shape[1])[None, :] < kv_lengths[:, None])
                if kv_lengths is not None
                else None
            )
            ff = self.ffn(x, deterministic, pad)
        else:
            ff = self.ffn(x, deterministic)
        x = shard_time(
            x + nn.Dropout(self.dropout_rate, deterministic=deterministic)(ff)
        )
        return self.norm2(x)

    def chunk_step(
        self,
        x: jnp.ndarray,
        cache_k: jnp.ndarray,
        cache_v: jnp.ndarray,
        key_bias: Optional[jnp.ndarray],
    ):
        """One streaming chunk through this layer (deterministic).

        x [B, ch, D] current chunk; cache_k/v [B, L*ch, H, Dh] the K/V of
        the previous `left_chunks` chunks; key_bias [B, 1, 1, (L+1)*ch]
        masks invalid cache slots (stream warm-up, final-chunk padding).
        Returns (out [B, ch, D], k_cur, v_cur [B, ch, H, Dh]) — the caller
        rolls the cache."""
        k_cur, v_cur = self.self_attn.project_kv(x)
        k_all = jnp.concatenate([cache_k, k_cur], axis=1)
        v_all = jnp.concatenate([cache_v, v_cur], axis=1)
        sa = self.self_attn.attend_step(x, k_all, v_all, key_bias)
        x = self.norm1(x + sa)
        ff = self.ffn(x, deterministic=True)
        out = self.norm2(x + ff)
        return out, k_cur, v_cur


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer with self + cross attention
    (reference: src/third_party/transformer.py:321-395), plus a KV-cached
    `step` path for O(1)-per-token decoding."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout_rate, self.dtype,
            name="self_attn",
        )
        self.cross_attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout_rate, self.dtype,
            name="cross_attn",
        )
        self.ffn = FeedForward(
            self.d_model, self.dim_feedforward, self.activation,
            self.dropout_rate, self.dtype, name="ffn",
        )
        self.norm1 = LayerNorm(dtype=self.dtype, name="norm1")
        self.norm2 = LayerNorm(dtype=self.dtype, name="norm2")
        self.norm3 = LayerNorm(dtype=self.dtype, name="norm3")

    def _drop(self, x, deterministic):
        return nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_bias: Optional[jnp.ndarray] = None,
        memory_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        tgt_causal: bool = False,
        memory_lengths: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        sa = self.self_attn(tgt, tgt, tgt_bias, deterministic, causal=tgt_causal)
        x = self.norm1(shard_time(tgt + self._drop(sa, deterministic)))
        ca = self.cross_attn(
            x, memory, memory_bias, deterministic, kv_lengths=memory_lengths
        )
        x = self.norm2(shard_time(x + self._drop(ca, deterministic)))
        ff = self.ffn(x, deterministic)
        return self.norm3(shard_time(x + self._drop(ff, deterministic)))

    def init_cache(self, batch: int, max_len: int, memory: jnp.ndarray) -> dict:
        """Build this layer's decode cache: growing self-attn K/V plus
        precomputed cross-attn K/V."""
        head_dim = self.d_model // self.nhead
        mem_k, mem_v = self.cross_attn.project_kv(memory)
        zeros = jnp.zeros(
            (batch, max_len, self.nhead, head_dim), dtype=self.dtype
        )
        return {"k": zeros, "v": zeros, "mem_k": mem_k, "mem_v": mem_v}

    def step(
        self,
        x_t: jnp.ndarray,
        cache: dict,
        index,
        self_bias_t: Optional[jnp.ndarray] = None,
        memory_bias: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, dict]:
        """One decode step. x_t [B,1,D]; returns ([B,1,D], new cache)."""
        cache_k, cache_v = self.self_attn.append_kv(
            x_t, cache["k"], cache["v"], index
        )
        sa = self.self_attn.attend_step(x_t, cache_k, cache_v, self_bias_t)
        x = self.norm1(x_t + sa)
        ca = self.cross_attn.attend_step(
            x, cache["mem_k"], cache["mem_v"], memory_bias
        )
        x = self.norm2(x + ca)
        ff = self.ffn(x, deterministic=True)
        out = self.norm3(x + ff)
        new_cache = dict(cache, k=cache_k, v=cache_v)
        return out, new_cache
