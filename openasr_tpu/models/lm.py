"""Language models: LSTM LM and Transformer LM.

Capability parity with reference: src/blocks/lm_layers.py:31-110 and the
(bit-rotted) src/train_lm.py entry point — restored here as working
capabilities.  Both models use tied input/output embeddings and causal
structure; they also serve shallow-fusion scoring during beam search.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import Framework, register_model
from openasr_tpu.models.layers import (
    TransformerEncoderLayer,
    _pe_table,
    positional_encoding,
)
from openasr_tpu.models.speech import target_lengths_of
from openasr_tpu.ops.losses import cal_ce_loss

Dtype = Any

XAVIER_NORMAL = nn.initializers.xavier_normal()


class LSTMLM(nn.Module):
    """Embedding -> n-layer LSTM -> tied output affine
    (reference: src/blocks/lm_layers.py:31-63)."""

    vocab_size: int
    d_model: int
    n_layers: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.emb = nn.Embed(
            self.vocab_size, self.d_model, embedding_init=XAVIER_NORMAL,
            dtype=self.dtype,
        )
        self.out_bias = self.param(
            "out_bias", nn.initializers.zeros, (self.vocab_size,)
        )
        self.cells = [
            nn.OptimizedLSTMCell(self.d_model, dtype=self.dtype)
            for _ in range(self.n_layers)
        ]
        self.rnns = [nn.RNN(cell) for cell in self.cells]
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, ids, deterministic: bool = True):
        # dropout sites mirror the reference exactly: after the
        # embedding (dropout1), BETWEEN LSTM layers (torch nn.LSTM's
        # dropout= applies to every layer's output except the last),
        # and after the stack (dropout2) — lm_layers.py:40-55
        x = self.emb(ids.astype(jnp.int32))
        x = self.dropout(x, deterministic=deterministic)
        for i, rnn in enumerate(self.rnns):
            x = rnn(x)
            if i < len(self.rnns) - 1:
                x = self.dropout(x, deterministic=deterministic)
        x = self.dropout(x, deterministic=deterministic)
        return self.emb.attend(x) + self.out_bias

    def step(self, tokens, carries):
        """One LM step for shallow fusion: tokens [B] + per-layer LSTM
        carries -> (log-probs [B, V], new carries)."""
        x = self.emb(tokens.astype(jnp.int32))
        new_carries = []
        for cell, carry in zip(self.cells, carries):
            carry, x = cell(carry, x)
            new_carries.append(carry)
        logits = self.emb.attend(x) + self.out_bias
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), new_carries

    def init_carries(self, batch: int):
        shape = (batch, self.d_model)
        zeros = jnp.zeros(shape, self.dtype)
        return [(zeros, zeros) for _ in range(self.n_layers)]


class TransformerLM(nn.Module):
    """Causal-masked transformer encoder as LM
    (reference: src/blocks/lm_layers.py:66-110), with an O(1)-per-token
    cached `step` for shallow fusion (make_lm_fusion) — the same
    KV-cache trick the ASR decoder uses."""

    vocab_size: int
    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    def setup(self):
        # attribute/explicit names keep the param tree identical to the
        # previous compact formulation: emb / layer{i} / out_bias
        self.emb = nn.Embed(
            self.vocab_size, self.d_model, embedding_init=XAVIER_NORMAL,
            dtype=self.dtype,
        )
        self.layers = [
            TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout_rate, self.activation, self.dtype,
                name=f"layer{i}",
            )
            for i in range(self.num_layers)
        ]
        self.dropout = nn.Dropout(self.dropout_rate)
        self.out_bias = self.param(
            "out_bias", nn.initializers.zeros, (self.vocab_size,)
        )

    def __call__(self, ids, lengths=None, deterministic: bool = True):
        x = self.emb(ids.astype(jnp.int32)) * math.sqrt(self.d_model)
        x = positional_encoding(x)
        x = self.dropout(x, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, None, deterministic, kv_lengths=lengths,
                      causal=True)
        return self.emb.attend(x) + self.out_bias

    def init_step_cache(self, batch: int, max_len: int = 512) -> dict:
        """Per-layer KV cache [B, max_len, H, Dh] + position index, for
        `step`.  max_len bounds the stream (decode lengths are far below
        the PE table's 5000)."""
        if max_len > 5000:
            # step's PE gather clamps at the 5000-row table — rows past it
            # would silently reuse PE[4999] and diverge from the batch
            # forward (which itself fails loudly past 5000).  Refuse the
            # cache size instead of silently breaking the exactness
            # contract.
            raise ValueError(
                f"TransformerLM.init_step_cache: max_len={max_len} "
                f"exceeds the 5000-row positional-encoding table; decode "
                f"in windows below it (the batch forward has the same "
                f"bound)"
            )
        head_dim = self.d_model // self.nhead
        zeros = jnp.zeros((batch, max_len, self.nhead, head_dim),
                          self.dtype)
        return {
            # PER-ROW position: in the CTC prefix beam, rows DIVERGE
            # (stay beams keep the parent cache un-advanced while
            # extensions advance), so every step computation — PE
            # offset, causal key mask, K/V write slot — must be per-row
            "idx": jnp.zeros((batch,), jnp.int32),
            "layers": [
                {"k": zeros, "v": zeros} for _ in range(self.num_layers)
            ],
        }

    def step(self, tokens, cache):
        """One LM step: tokens [B] + cache -> (log-probs [B, V], cache).
        Exact against the causal batch forward (each row's current token
        attends that row's cache positions < idx[row] plus itself —
        precisely row idx of the causal mask).

        Everything is PER-ROW: the CTC prefix beam mixes rows at
        different positions in one call (stays carry the parent cache
        un-advanced while extensions advance), so PE offset, key mask,
        and the K/V write slot are gathered/scattered by each row's own
        idx — a single shared `idx[0]` would silently corrupt every
        divergent row's scores.  A row at idx == max_len drops its K/V
        write (the one-hot scatter has no matching slot) rather than
        overwriting an occupied one; size the cache so this never
        happens (make_lm_fusion's max_len)."""
        idx = cache["idx"]  # [B]
        b = tokens.shape[0]
        x = self.emb(tokens.astype(jnp.int32))[:, None, :] * math.sqrt(
            self.d_model
        )
        # per-row positional encoding: row b gets PE[idx[b]] (the
        # sqrt(d) factor matches positional_encoding's scaling)
        pe = jnp.asarray(_pe_table(self.d_model, 5000))[
            jnp.clip(idx, 0, 4999)
        ].astype(x.dtype)  # [B, D]
        x = x * (self.d_model ** 0.5) + pe[:, None, :]
        max_len = cache["layers"][0]["k"].shape[1]
        pos = jnp.arange(max_len + 1)
        valid = (pos[None, :] < idx[:, None]) | (pos[None, :] == max_len)
        key_bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
        write = (
            jnp.arange(max_len)[None, :] == idx[:, None]
        )[:, :, None, None]  # [B, L, 1, 1]
        new_layers = []
        for layer, lc in zip(self.layers, cache["layers"]):
            out, k_cur, v_cur = layer.chunk_step(
                x, lc["k"], lc["v"], key_bias
            )
            new_layers.append({
                "k": jnp.where(write, k_cur.astype(lc["k"].dtype), lc["k"]),
                "v": jnp.where(write, v_cur.astype(lc["v"].dtype), lc["v"]),
            })
            x = out
        logits = self.emb.attend(x[:, 0]) + self.out_bias
        return (
            jax.nn.log_softmax(logits.astype(jnp.float32), -1),
            {"idx": idx + 1, "layers": new_layers},
        )


class _LMFramework(Framework):
    def loss(self, params, batch, rngs, train=True, label_smooth=0.0, **_):
        logits = self.module.apply(
            {"params": params}, batch["ids"],
            deterministic=not train, rngs=rngs if train else None,
        )
        return {
            "ce_loss": cal_ce_loss(
                logits, batch["labels"], batch["paddings"], label_smooth
            ),
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": jnp.asarray(batch["ids"].shape[0], jnp.float32),
        }

    def perplexity(self, params, batch) -> float:
        losses = self.loss(params, batch, {}, train=False)
        return float(
            jnp.exp(losses["ce_loss"] / jnp.maximum(losses["n_tokens"], 1.0))
        )


@register_model("lstm_lm")
class LSTMLMModel(_LMFramework):
    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        m = configs.model if configs.model else configs
        module = LSTMLM(
            vocab_size=int(m["vocab_size"]),
            d_model=int(m["d_model"]),
            n_layers=int(m.get("n_layers", 2)),
            dropout_rate=float(m.get("dropout_rate", 0.0)),
            dtype=dtype,
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = module.init(
            {"params": rng, "dropout": rng}, jnp.zeros((2, 8), jnp.int32)
        )
        return cls(module, variables["params"], configs)


@register_model("transformer_lm")
class TransformerLMModel(_LMFramework):
    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        m = configs.model if configs.model else configs
        module = TransformerLM(
            vocab_size=int(m["vocab_size"]),
            d_model=int(m["d_model"]),
            nhead=int(m.get("nhead", 8)),
            num_layers=int(m.get("num_layers", 6)),
            dim_feedforward=int(m.get("dim_feedforward", 4 * int(m["d_model"]))),
            dropout_rate=float(m.get("dropout_rate", 0.1)),
            activation=m.get("activation", "relu"),
            dtype=dtype,
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = module.init(
            {"params": rng, "dropout": rng}, jnp.zeros((2, 8), jnp.int32)
        )
        return cls(module, variables["params"], configs)


def make_lm_step_spec(lm) -> dict:
    """Process-wide, param-riding LM stepping spec for the decode CLIs
    and the streaming beam: dict(step_fn, init_cache_fn, params).

    step_fn (lm_params, tokens, cache) -> (log_probs, cache) closes over
    the MODULE only, so the weights ride as ONE traced jit argument
    instead of being constant-folded into every shape-bucket executable
    — and the closure itself is a static jit key, so build the spec
    ONCE per LM, not per batch (a fresh closure per call would
    retrace).  init_cache_fn(bb, max_tokens) sizes the cache for bb
    beam rows and up to max_tokens LM steps (the KV budget for a
    transformer LM; ignored by the stateless-size LSTM carries).

    Dispatches on the LM type like make_lm_fusion."""
    lm_module = lm.module if hasattr(lm, "module") else lm
    lm_host_params = lm.params

    if isinstance(lm_module, TransformerLM):
        def step_fn(lm_p, tokens, cache):
            return lm_module.apply(
                {"params": lm_p}, tokens, cache,
                method=TransformerLM.step,
            )

        def init_cache_fn(bb, max_tokens):
            return lm_module.apply(
                {"params": lm_host_params}, int(bb), int(max_tokens),
                method=TransformerLM.init_step_cache,
            )
    else:
        def step_fn(lm_p, tokens, cache):
            return lm_module.apply(
                {"params": lm_p}, tokens, cache, method=LSTMLM.step
            )

        def init_cache_fn(bb, max_tokens):
            return lm_module.apply(
                {"params": lm_host_params}, int(bb),
                method=LSTMLM.init_carries,
            )

    return {"step_fn": step_fn, "init_cache_fn": init_cache_fn,
            "params": lm_host_params}


def make_lm_fusion(lm, lm_params, bb: int, max_len: int = 512):
    """(lm_step_fn, init_lm_cache) for LM shallow fusion over bb beam
    rows; (None, None) when no LM is given.  Shared by every
    batch_beam_decode (speech.py / cif.py) so the carry-init and step
    plumbing cannot drift between families.

    Dispatches on the LM type: LSTM carries for `lstm_lm`, a KV cache
    of `max_len` positions for `transformer_lm` (its O(1) `step` is
    exact against the causal batch forward)."""
    if lm is None:
        return None, None
    lm_module = lm.module if hasattr(lm, "module") else lm
    lm_p = lm_params if lm_params is not None else lm.params

    if isinstance(lm_module, TransformerLM):
        init_lm_cache = lm_module.apply(
            {"params": lm_p}, bb, max_len,
            method=TransformerLM.init_step_cache,
        )

        def lm_step_fn(tokens, lm_cache):
            return lm_module.apply(
                {"params": lm_p}, tokens, lm_cache,
                method=TransformerLM.step,
            )

        return lm_step_fn, init_lm_cache

    init_lm_cache = lm_module.apply(
        {"params": lm_p}, bb, method=LSTMLM.init_carries
    )

    def lm_step_fn(tokens, lm_cache):
        return lm_module.apply(
            {"params": lm_p}, tokens, lm_cache, method=LSTMLM.step
        )

    return lm_step_fn, init_lm_cache
