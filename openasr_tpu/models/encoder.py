"""Encoders: Transformer (with conv subsampling) and GRU.

Capability parity with reference: src/blocks/encoders.py:26-114.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.models.layers import (
    XAVIER_UNIFORM,
    LayerNorm,
    TransformerEncoderLayer,
    positional_encoding,
)
from openasr_tpu.models.subsample import (
    Conv1dSubsample,
    Conv2dSubsample,
    Conv2dSubsampleV2,
)

Dtype = Any


class PipelinedEncoderStack(nn.Module):
    """Stacked-layout transformer layer stack: parameters live as ONE
    layer-shaped pytree whose leaves carry a leading [L] dim (param name
    'stacked_layers'), the layout the GPipe executor
    (parallel/pipeline.py) and the 'pipe' mesh shardings
    (parallel/mesh.py:_spec_for) consume.  Under an active pipeline
    context (a solver on a pipe>1 mesh) the stack streams microbatches
    through the stages; otherwise — decode, CPU tests, single-chip — an
    mathematically identical sequential lax.scan runs, so checkpoints
    trained pipelined decode anywhere.

    `tools/stack_encoder_pkg.py` converts a per-layer checkpoint
    ('layer{i}' children, the reference-compatible layout) to/from this
    stacked layout."""

    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        from openasr_tpu.parallel.pipeline import (
            gpipe_apply,
            pipeline_context,
        )

        layer = TransformerEncoderLayer(
            self.d_model, self.nhead, self.dim_feedforward,
            self.dropout_rate, self.activation, self.dtype,
        )
        dx = jnp.zeros((1,) + x.shape[1:], x.dtype)
        dl = jnp.ones((1,), jnp.int32)

        def init_stacked(rng):
            def one(r):
                return layer.init(r, dx, None, True, dl, False)["params"]
            return jax.vmap(one)(jax.random.split(rng, self.num_layers))

        stacked = self.param("stacked_layers", init_stacked)
        need_rng = self.dropout_rate > 0.0 and not deterministic
        rng = self.make_rng("dropout") if need_rng else None

        def layer_apply(lp, h, aux, rr):
            rngs = {"dropout": rr} if rr is not None else None
            return layer.apply(
                {"params": lp}, h, None, rr is None, aux["lengths"], False,
                rngs=rngs,
            )

        ctx = pipeline_context()
        if ctx is not None:
            mesh, m_req = ctx
            b = x.shape[0]
            # largest microbatch count <= requested that divides the batch
            m = max(1, min(int(m_req), b))
            while b % m:
                m -= 1
            return gpipe_apply(
                layer_apply, stacked, x, {"lengths": lengths}, mesh, m,
                rng=rng, remat=self.remat,
            )

        # sequential fallback: same math, one layer at a time
        apply_one = jax.checkpoint(layer_apply) if self.remat else layer_apply

        def body(carry, lp):
            i, h = carry
            rr = jax.random.fold_in(rng, i) if rng is not None else None
            h = apply_one(lp, h, {"lengths": lengths}, rr)
            return (i + jnp.int32(1), h), None

        (_, h), _ = jax.lax.scan(body, (jnp.int32(0), x), stacked)
        return h


class TransformerEncoder(nn.Module):
    """Conv subsampling -> scaled PE + dropout -> N post-LN layers -> final
    LayerNorm (reference: src/blocks/encoders.py:26-80; the final norm
    mirrors the reference's `encoder_norm`)."""

    input_dim: int
    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    sub_type: Optional[str] = None  # ConvV1 | ConvV2 | Stack | None
    sub_layer_num: int = 2
    context_width: int = 3
    subsample: int = 1
    remat: bool = False  # jax.checkpoint each layer: trade FLOPs for HBM
    # encoder.pipeline: stacked layer layout (PipelinedEncoderStack) —
    # GPipe pipeline parallelism when the solver runs on a pipe>1 mesh,
    # an identical sequential scan otherwise
    pipeline: bool = False
    # encoder.streaming: {chunk: N, left_chunks: L} — train (and full-
    # utterance decode) with the chunk-attention bias (ops/masks.py:
    # chunk_bias) so the cached streaming executor (streaming.py) is
    # BIT-EXACT with the batch forward.  chunk is in post-subsample
    # encoder frames; left_chunks < 0 = unlimited left context.
    # streaming_phase = the executor's start-up garbage-slot count
    # (ops/masks.py:chunk_bias): 2 for a wave->fbank frontend, 1 for
    # offline features — resolved by the model builders from
    # signal.feature_type (speech.py:streaming_phase_of).
    streaming_chunk: int = 0
    streaming_left: int = -1
    streaming_phase: int = 1
    # encoder.moe: {num_experts, top_k, capacity_factor, every} — replace
    # the dense FFN of every `every`-th layer (the later of each pair,
    # GShard-style, for every=2) with a top-k routed expert mixture
    # (models/moe.py).  Expert tables shard over the mesh's 'data' axis
    # — expert parallelism, composable with TP/SP/ZeRO-1 on one mesh.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity: float = 1.25
    moe_every: int = 2
    moe_router: str = "topk"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        deterministic: bool = True,
    ):
        feats = feats.astype(self.dtype)
        if self.sub_type == "ConvV1":
            x, lengths = Conv2dSubsample(
                self.input_dim, self.d_model, self.dtype, name="sub"
            )(feats, feat_lengths)
        elif self.sub_type == "ConvV2":
            x, lengths = Conv2dSubsampleV2(
                self.input_dim, self.d_model, self.sub_layer_num, self.dtype,
                name="sub",
            )(feats, feat_lengths)
        elif self.sub_type == "Stack":
            x, lengths = Conv1dSubsample(
                self.input_dim, self.d_model, self.context_width,
                self.subsample, self.dtype, name="sub",
            )(feats, feat_lengths)
        elif self.input_dim == self.d_model:
            x, lengths = feats, feat_lengths
        else:
            x = nn.Dense(
                self.d_model, kernel_init=XAVIER_UNIFORM, dtype=self.dtype,
                name="affine",
            )(feats)
            lengths = feat_lengths

        x = positional_encoding(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

        if self.moe_experts > 0 and self.pipeline:
            raise NotImplementedError(
                "encoder.moe does not compose with encoder.pipeline: the "
                "GPipe stack scans over structurally identical layers"
            )
        if self.moe_experts > 0 and self.streaming_chunk > 0:
            raise NotImplementedError(
                "encoder.moe does not compose with encoder.streaming: "
                "per-chunk expert capacity would diverge from the batch "
                "forward, breaking the executor's exactness guarantee"
            )

        bias = None
        if self.streaming_chunk > 0:
            # dense additive bias: chunk mask + key padding.  The dense
            # path (not the flash kernel) runs here — streaming encoders
            # subsample x4 first, so T is small and the chunk mask keeps
            # most of the score matrix masked anyway.
            from openasr_tpu.ops.masks import (
                chunk_bias,
                combine_bias,
                padding_bias,
            )

            if self.pipeline:
                raise NotImplementedError(
                    "encoder.streaming does not compose with "
                    "encoder.pipeline: the GPipe stack threads only "
                    "kv_lengths through its stages"
                )
            bias = combine_bias(
                padding_bias(lengths, x.shape[1]),
                chunk_bias(x.shape[1], self.streaming_chunk,
                           self.streaming_left, self.streaming_phase),
            )

        if self.pipeline:
            x = PipelinedEncoderStack(
                self.d_model, self.nhead, self.dim_feedforward,
                self.num_layers, self.dropout_rate, self.activation,
                self.remat, self.dtype, name="stack",
            )(x, lengths, deterministic)
        else:
            layer_cls = (
                nn.remat(TransformerEncoderLayer, static_argnums=(3, 5))
                if self.remat
                else TransformerEncoderLayer
            )
            for i in range(self.num_layers):
                moe_here = (
                    self.moe_experts > 0
                    and i % self.moe_every == self.moe_every - 1
                )
                x = layer_cls(
                    self.d_model, self.nhead, self.dim_feedforward,
                    self.dropout_rate, self.activation, self.dtype,
                    moe_experts=self.moe_experts if moe_here else 0,
                    moe_top_k=self.moe_top_k,
                    moe_capacity=self.moe_capacity,
                    moe_router=self.moe_router,
                    name=f"layer{i}",
                )(x, bias, deterministic,
                  None if bias is not None else lengths, False)
        x = LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return x, lengths

    @staticmethod
    def from_config(
        cfg, dtype=jnp.float32, streaming_phase: int = 1
    ) -> "TransformerEncoder":
        sub = cfg.get("sub") or {}
        streaming = cfg.get("streaming") or {}
        moe = cfg.get("moe") or {}
        if moe:
            # config.validate_moe rejects these at load time with richer
            # messages; this guard covers programmatic construction
            # (every=0 would ZeroDivisionError inside the traced layer
            # loop; every>num_layers silently builds zero MoE layers)
            every = int(moe.get("every", 2))
            if every < 1 or int(moe.get("top_k", 2)) < 1:
                raise ValueError(f"invalid encoder.moe config: {moe}")
            if int(moe.get("num_experts", 0)) > 0 and every > int(
                cfg["num_layers"]
            ):
                raise ValueError(
                    f"encoder.moe.every={every} > num_layers="
                    f"{cfg['num_layers']}: zero MoE layers would be built"
                )
        return TransformerEncoder(
            input_dim=int(cfg["input_dim"]),
            d_model=int(cfg["d_model"]),
            nhead=int(cfg["nhead"]),
            dim_feedforward=int(cfg["dim_feedforward"]),
            num_layers=int(cfg["num_layers"]),
            dropout_rate=float(cfg.get("dropout_rate", 0.1)),
            activation=cfg.get("activation", "relu"),
            sub_type=sub.get("type"),
            sub_layer_num=int(sub.get("layer_num", 2)),
            context_width=int(cfg.get("context_width", 3)),
            subsample=int(cfg.get("subsample", 1)),
            remat=bool(cfg.get("remat", False)),
            pipeline=bool(cfg.get("pipeline", False)),
            streaming_chunk=int(streaming.get("chunk", 0)),
            streaming_left=int(streaming.get("left_chunks", -1)),
            streaming_phase=streaming_phase,
            moe_experts=int(moe.get("num_experts", 0)),
            moe_top_k=int(moe.get("top_k", 2)),
            moe_capacity=float(moe.get("capacity_factor", 1.25)),
            moe_every=int(moe.get("every", 2)),
            moe_router=str(moe.get("router", "topk")),
            dtype=dtype,
        )


class GRUEncoder(nn.Module):
    """Unidirectional multi-layer GRU (reference: src/blocks/encoders.py:83-114),
    run as a scanned flax GRUCell per layer."""

    d_input: int
    d_model: int
    n_layers: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        deterministic: bool = True,
    ):
        x = feats.astype(self.dtype)
        b = x.shape[0]
        for layer in range(self.n_layers):
            cell = nn.GRUCell(
                features=self.d_model, dtype=self.dtype,
                kernel_init=nn.initializers.kaiming_normal(),
                name=f"gru{layer}",
            )
            carry = cell.initialize_carry(jax.random.PRNGKey(0), (b, self.d_model))
            scan = nn.RNN(cell, name=f"rnn{layer}")
            x = scan(x, initial_carry=carry)
            if layer + 1 < self.n_layers and self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x, feat_lengths

    @staticmethod
    def from_config(cfg, dtype=jnp.float32) -> "GRUEncoder":
        return GRUEncoder(
            d_input=int(cfg["d_input"]),
            d_model=int(cfg["d_model"]),
            n_layers=int(cfg["n_layers"]),
            dropout_rate=float(cfg.get("dropout", 0.0)),
            dtype=dtype,
        )
