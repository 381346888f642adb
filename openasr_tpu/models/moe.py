"""Mixture-of-Experts FFN with expert parallelism (beyond-reference).

The reference (eastonYi/OpenASR) has no sparse scaling story at all — its
largest trainable model is whatever fits one GPU under DataParallel
(reference: src/train.py:132-134).  This module adds the GShard/Switch
recipe as a first-class encoder option (`encoder.moe`), designed for the
TPU from the start:

  * **Dense dispatch on the MXU.**  Routing is expressed as one-hot
    dispatch/combine tensors [B, T, E, C] and einsums — static shapes,
    no gather/scatter, no dynamic slicing; the whole layer is four
    batched matmuls XLA tiles straight onto the systolic array.
  * **Expert parallelism as placement.**  Expert weight tables [E, ...]
    shard dim 0 over the mesh's 'data' axis (parallel/mesh.py:_spec_for)
    and `shard_experts` pins the dispatched activations [E, B, C, D] the
    same way — GSPMD derives the canonical all-to-all pair (tokens →
    expert shards → tokens) on ICI.  Each chip stores and runs E/|data|
    experts; the FFN inner dim additionally shards over 'model' under
    tensor parallelism, so EP composes with TP/SP/ZeRO-1 on one mesh.
  * **Static capacity.**  C = ceil(capacity_factor * T * top_k / E) per
    batch row; overflow tokens pass through on the residual stream (the
    standard GShard semantics).  Padding tokens never consume capacity
    when a validity mask is available (the encoder passes one whenever it
    has `kv_lengths`).  Memory note: the dispatch/combine tensors are
    [B, T, E, C] with C ∝ T, i.e. O(B·T²·top_k·capacity_factor) floats
    per MoE layer — comparable to one attention-score matrix, and paid
    even under remat.  Cheap at post-x4-subsample T; for much longer
    sequences lower capacity_factor or group tokens GShard-style.

Router math runs in float32 regardless of the compute dtype (softmax over
expert logits is precision-sensitive); the load-balance auxiliary loss
(Switch Transformer eq. 4: E * Σ_e fraction_e · prob_e) is sown into the
'moe' collection and collected by `Framework.apply_with_moe_aux`
(models/__init__.py) — decode paths never request the collection, so the
sow is dead code there and XLA removes it.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.parallel.mesh import shard_experts

Dtype = Any
XAVIER_UNIFORM = nn.initializers.xavier_uniform()


def _capacity(tokens: int, num_experts: int, top_k: int, factor: float) -> int:
    cap = int(-(-(tokens * top_k * factor) // num_experts))  # ceil
    return max(cap, 1)


class MoEFeedForward(nn.Module):
    """Routed mixture of position-wise FFN experts.

    Drop-in for `FeedForward` (layers.py) inside a post-LN encoder layer.
    Two routers (``router_type``):

      * ``topk`` (default, GShard/Switch): each token picks its top-k
        experts; y[token] = Σ_j gate_j · FFN_{e_j}(x[token]) with gates
        renormalized over the selected k; tokens overflowing an expert's
        capacity get 0 (they survive via the residual add); the Switch
        load-balance auxiliary is sown for the training objective.
      * ``expert_choice`` (Zhou et al. 2022): each expert picks its top-C
        tokens per batch row — perfect load balance BY CONSTRUCTION
        (every expert processes exactly C tokens; no auxiliary loss, none
        is sown), variable experts-per-token.  The TPU-natural variant:
        one more static top_k, same dense dispatch/combine einsums.
        Encoder-only (routing looks ahead over the whole row — exactly
        why MoE already rejects `encoder.streaming`).
    """

    d_model: int
    dim_feedforward: int
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    activation: str = "relu"
    dropout_rate: float = 0.0
    router_type: str = "topk"
    dtype: Dtype = jnp.float32

    SUPPORTED_ACTIVATIONS = ("relu", "gelu", "glu")
    SUPPORTED_ROUTERS = ("topk", "expert_choice")

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [B, T, D]; pad_mask: optional [B, T] (1 = valid token)."""
        B, T, D = x.shape
        E, K = self.num_experts, min(self.top_k, self.num_experts)
        C = min(_capacity(T, E, K, self.capacity_factor), T)
        if self.router_type not in self.SUPPORTED_ROUTERS:
            raise ValueError(
                f"moe router must be one of {self.SUPPORTED_ROUTERS}, "
                f"got {self.router_type!r}"
            )

        # ---- router (float32: softmax over expert logits is the one
        # numerically delicate spot in the layer)
        logits = nn.Dense(
            E, kernel_init=XAVIER_UNIFORM, dtype=jnp.float32, name="router"
        )(x.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)  # [B, T, E] f32
        valid = (
            pad_mask.astype(jnp.float32)
            if pad_mask is not None
            else jnp.ones((B, T), jnp.float32)
        )

        if self.router_type == "expert_choice":
            combine = self._expert_choice_combine(gates, valid, C)
        else:
            combine = self._topk_combine(gates, valid, K, C)

        dispatch = (combine > 0).astype(self.dtype)  # [B, T, E, C]
        # ---- expert compute: [E, B, C, D] rides the 'data'-sharded
        # expert tables; shard_experts pins the layout so GSPMD emits the
        # dispatch/return all-to-alls instead of all-gathering the tokens.
        # glu mirrors the dense FeedForward (layers.py:268-283, reference
        # semantics src/third_party/transformer.py:279-281,400-408): a
        # second per-expert gate table w_gate/b_gate the same shape as
        # w1/b1, h = (x·w1+b1) * sigmoid(x·w_gate+b_gate) — per-expert
        # slicing of the dense layer's width-2F linear1 split.
        if self.activation not in self.SUPPORTED_ACTIVATIONS:
            raise ValueError(
                f"moe supports {'/'.join(self.SUPPORTED_ACTIVATIONS)} "
                f"activations, got {self.activation!r}"
            )
        w1 = self.param(
            "w1", XAVIER_UNIFORM, (E, D, self.dim_feedforward), jnp.float32
        ).astype(self.dtype)
        b1 = self.param(
            "b1", nn.initializers.zeros, (E, self.dim_feedforward), jnp.float32
        ).astype(self.dtype)
        w2 = self.param(
            "w2", XAVIER_UNIFORM, (E, self.dim_feedforward, D), jnp.float32
        ).astype(self.dtype)
        b2 = self.param(
            "b2", nn.initializers.zeros, (E, D), jnp.float32
        ).astype(self.dtype)

        xin = shard_experts(
            jnp.einsum("btec,btd->ebcd", dispatch, x.astype(self.dtype)),
            from_tokens=True,
        )
        h = jnp.einsum("ebcd,edf->ebcf", xin, w1) + b1[:, None, None, :]
        if self.activation == "relu":
            h = nn.relu(h)
        elif self.activation == "gelu":
            h = nn.gelu(h, approximate=False)
        elif self.activation == "glu":
            w_gate = self.param(
                "w_gate", XAVIER_UNIFORM,
                (E, D, self.dim_feedforward), jnp.float32,
            ).astype(self.dtype)
            b_gate = self.param(
                "b_gate", nn.initializers.zeros,
                (E, self.dim_feedforward), jnp.float32,
            ).astype(self.dtype)
            g = (
                jnp.einsum("ebcd,edf->ebcf", xin, w_gate)
                + b_gate[:, None, None, :]
            )
            h = h * nn.sigmoid(g)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        out = shard_experts(
            jnp.einsum("ebcf,efd->ebcd", h, w2) + b2[:, None, None, :]
        )
        y = jnp.einsum("ebcd,btec->btd", out, combine.astype(self.dtype))

        # ---- load-balance auxiliary (Switch eq. 4), over valid tokens:
        # E * Σ_e (fraction of tokens whose top-1 is e) · (mean router
        # prob of e).  Minimized (=1) by a uniform router.  expert_choice
        # sows nothing: every expert processes exactly C tokens by
        # construction, there is no balance to train.
        if self.router_type == "topk":
            n_valid = jnp.maximum(jnp.sum(valid), 1.0)
            me = jnp.sum(gates * valid[..., None], axis=(0, 1)) / n_valid
            top1 = jax.nn.one_hot(
                jnp.argmax(gates, axis=-1), E, dtype=jnp.float32
            )
            ce = jnp.sum(top1 * valid[..., None], axis=(0, 1)) / n_valid
            self.sow("moe", "aux_loss", E * jnp.sum(me * ce))

        return y.astype(x.dtype)

    # ------------------------------------------------------------ routers

    def _topk_combine(self, gates, valid, K: int, C: int):
        """GShard token-choice: combine [B, T, E, C] from each token's
        renormalized top-k gates, FIFO position-in-expert, capacity C."""
        B, T, E = gates.shape
        top_g, top_i = jax.lax.top_k(gates, K)  # [B, T, K]
        top_g = top_g / jnp.maximum(
            jnp.sum(top_g, axis=-1, keepdims=True), 1e-9
        )

        # position-in-expert: choice j of each token is placed after
        # every choice j'<j and after all earlier tokens' choice j
        # (GShard ordering).  cumsum is over T only — each batch row is
        # its own routing group, so the dispatch shape stays [B, T, E, C]
        # and the batch dim stays 'data'-sharded end to end.
        combine = jnp.zeros((B, T, E, C), jnp.float32)
        offsets = jnp.zeros((B, E), jnp.float32)
        for j in range(K):
            m = jax.nn.one_hot(top_i[..., j], E, dtype=jnp.float32)
            m = m * valid[..., None]  # padding never consumes capacity
            pos = jnp.cumsum(m, axis=1) - m + offsets[:, None, :]
            kept = m * (pos < C)
            slot = jax.nn.one_hot(
                jnp.sum(pos * m, axis=-1).astype(jnp.int32), C,
                dtype=jnp.float32,
            )  # [B, T, C]: the chosen expert's slot index
            combine = combine + (
                top_g[..., j, None, None] * kept[..., None]
                * slot[:, :, None, :]
            )
            offsets = offsets + jnp.sum(m, axis=1)
        return combine

    def _expert_choice_combine(self, gates, valid, C: int):
        """Expert-choice: per batch row, expert e's C slots hold the C
        tokens with the highest router prob for e (masked tokens are
        never picked while any valid token remains); the combine weight
        is the unnormalized router prob, as in the EC paper."""
        # mask padded tokens BELOW any real softmax output so top_k
        # prefers every valid token over any padded one
        masked = jnp.where(valid[:, :, None] > 0, gates, -1.0)  # [B,T,E]
        per_e = jnp.swapaxes(masked, 1, 2)  # [B, E, T]
        g, idx = jax.lax.top_k(per_e, C)  # [B, E, C]
        sel = jax.nn.one_hot(idx, per_e.shape[-1], dtype=jnp.float32)
        # a slot that had to take a masked token (all-padded row tail)
        # contributes nothing
        picked = sel * (g[..., None] > 0)  # [B, E, C, T]
        combine_ect = g[..., None] * picked
        return jnp.transpose(combine_ect, (0, 3, 1, 2))  # [B, T, E, C]
