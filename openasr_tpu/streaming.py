"""Streaming (incremental) inference for chunk-trained speech models.

The reference is batch-only (src/infer.py decodes whole utterances); this
is the production low-latency path the rebuild adds: train any
Conv_CTC / Conv_CTC_Transformer / Conv_Transformer with
``encoder.streaming: {chunk: N, left_chunks: L}`` (the chunk-attention
bias, ops/masks.py:chunk_bias) and decode it incrementally with O(chunk)
work per step and bounded state — the U2-style recipe, designed
TPU-first: every chunk step is ONE jitted program over static shapes
(fixed chunk size, fixed KV-cache length), so serving B parallel streams
costs one small batched program per tick with zero retracing.

**Bit-exactness, not approximation.** Because training uses the same
chunk mask the executor realizes with caches, the streaming encoder
output equals the batch forward EXACTLY (same floating-point ops):
tests/test_streaming.py asserts equality of encoder states, CTC logits,
and hypotheses.

How the cascade stays exact (all stages are VALID/snip-edges, so each
stage is a pure function of a bounded input window):

  wave chunk [B, 4*ch*shift] --(fbank, 4*shift-sample cache)-->
  4*ch feature frames        --(x4 conv subsample, 4-frame cache)-->
  ch encoder frames          --(chunk attention, L*ch-frame KV cache/layer)-->
  ch encoder states          --(pointwise CTC head)--> ch logit frames

Start-up phase: the fbank window (25 ms vs 10 ms shift) looks 2 frames
ahead and the VALID conv 1 encoder frame, so the stream's first
``phase`` encoder slots (2 for wave input, 1 for offline features) are
warm-up garbage — they are masked as attention keys and never emitted,
and the training mask's matching ``phase`` aligns every later chunk
boundary (ops/masks.py:chunk_bias).

State is a pytree of fixed-shape device arrays (functional, replayable,
trivially checkpointable); the host never holds anything but the token
ring. Per-stream lengths are supported: pad the final short chunk with
zeros and pass its true length — identical to how the batch path pads.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openasr_tpu.models.layers import TransformerEncoderLayer, _pe_table
from openasr_tpu.models.subsample import (
    Conv2dSubsample,
    Conv2dSubsampleV2,
    conv_out_len,
)
from openasr_tpu.ops.fbank import FbankConfig, fbank, fbank_config_from_model_cfg
from openasr_tpu.ops.masks import NEG_INF


def _enc_frames_of(n, window: int, shift: int, offline: bool):
    """True encoder-frame count for n input units (samples or feature
    frames): snip-edges framing then two VALID (3,2) conv layers — the
    same `conv_out_len` rule the batch subsampler applies
    (models/subsample.py), so the two paths cannot drift."""
    if offline:
        f = n
    else:
        f = jnp.where(n >= window, (n - window) // shift + 1, 0)
    t1 = jnp.maximum(conv_out_len(f, 3, 2), 0)
    return jnp.maximum(conv_out_len(t1, 3, 2), 0)


class StreamingRecognizer:
    """Incremental executor for one streaming-trained model over B
    parallel streams.

    Usage::

        rec = StreamingRecognizer(model)              # or (model, params)
        state = rec.init_state(batch_size)
        for chunk in chunks:                          # [B, chunk_samples]
            state, out = rec.step(state, chunk)       # jitted, O(chunk)
            # out["logits"] [B, ch, V], out["valid"] [B, ch], out["enc"]
        ...pad the final short chunk and pass chunk_lens...

    `decode_waves` drives the loop host-side with greedy CTC partials.
    """

    def __init__(
        self,
        model,
        params=None,
        use_jit: bool = True,
        max_frames: int = 5000,
    ):
        self.model = model
        self.params = params if params is not None else model.params
        # Positional-encoding capacity in encoder frames.  The batch
        # forward slices a 5000-row PE table and fails LOUDLY (trace-time
        # dynamic_slice error) past it; the streaming gather would clamp
        # silently instead, so `step` enforces the same bound explicitly.
        # Raise max_frames for longer-running streams — the sinusoidal
        # table is a closed form, so extra rows match what a batch forward
        # with a larger max_len would compute.
        self.max_frames = int(max_frames)
        cfgs = model.configs
        enc_cfg = cfgs.encoder or {}
        streaming = enc_cfg.get("streaming") or {}
        self.chunk = int(streaming.get("chunk", 0))
        self.left = int(streaming.get("left_chunks", -1))
        if self.chunk <= 0:
            raise ValueError(
                "model has no encoder.streaming config — train with "
                "encoder.streaming: {chunk: N, left_chunks: L} to stream"
            )
        if self.left < 0:
            raise ValueError(
                "encoder.streaming.left_chunks must be >= 0 to stream: "
                "unlimited left context cannot run with a bounded KV cache"
            )

        signal = cfgs.signal or {}
        self.offline = signal.get("feature_type") != "fbank"
        self.phase = 1 if self.offline else 2

        sub = enc_cfg.get("sub") or {}
        sub_type = sub.get("type")
        layer_num = int(sub.get("layer_num", 2))
        if sub_type == "ConvV1":
            self._sub = Conv2dSubsample(
                int(enc_cfg["input_dim"]), int(enc_cfg["d_model"]),
                model.module.encoder.dtype,
            )
        elif sub_type == "ConvV2" and layer_num == 2:
            self._sub = Conv2dSubsampleV2(
                int(enc_cfg["input_dim"]), int(enc_cfg["d_model"]), 2,
                model.module.encoder.dtype,
            )
        else:
            raise ValueError(
                "streaming needs an x4 time subsampler (sub.type ConvV1, "
                f"or ConvV2 with layer_num 2); got {sub_type!r} "
                f"layer_num={layer_num}"
            )

        enc = model.module.encoder
        self.d_model = enc.d_model
        self.nhead = enc.nhead
        self.n_layers = enc.num_layers
        self._layer = TransformerEncoderLayer(
            enc.d_model, enc.nhead, enc.dim_feedforward,
            enc.dropout_rate, enc.activation, enc.dtype,
        )
        from openasr_tpu.models.layers import LayerNorm

        self._final_norm = LayerNorm(dtype=enc.dtype)

        # CTC head: ctc_fc (conv-ctc-transformer) or fc (conv-ctc);
        # attention-only models stream encoder states for a final
        # attention decode.
        self._head_name = next(
            (n for n in ("ctc_fc", "fc") if n in self.params), None
        )

        if self.offline:
            self.feat_dim = int(enc_cfg["input_dim"])
            self.chunk_feats = 4 * self.chunk
            self._fbank_cfg = None
            self.window = self.shift = 1
        else:
            cfg = fbank_config_from_model_cfg(signal)
            # inference is deterministic: dither off like the batch path
            self._fbank_cfg = cfg
            self.window, self.shift = cfg.window_size, cfg.window_shift
            if self.window > 5 * self.shift:
                raise ValueError(
                    f"frame window {self.window} > 5x shift {self.shift}: "
                    "the 4-slot fbank lookahead cache cannot cover it"
                )
            self.feat_dim = cfg.feat_dim
            self.chunk_samples = 4 * self.chunk * self.shift

        self._step = jax.jit(self._step_impl) if use_jit else self._step_impl

    # ------------------------------------------------------------- state

    def init_state(self, batch_size: int) -> dict:
        b, ch = batch_size, self.chunk
        head_dim = self.d_model // self.nhead
        dtype = self.model.module.encoder.dtype
        kv = {
            f"layer{i}": {
                "k": jnp.zeros((b, self.left * ch, self.nhead, head_dim), dtype),
                "v": jnp.zeros((b, self.left * ch, self.nhead, head_dim), dtype),
            }
            for i in range(self.n_layers)
        }
        state = {
            "kv": kv,
            "chunk_idx": jnp.zeros((), jnp.int32),
            "fed": jnp.zeros((b,), jnp.int32),  # samples or feat frames
            "feat_cache": jnp.zeros((b, 4, self.feat_dim), jnp.float32),
        }
        if not self.offline:
            state["wave_cache"] = jnp.zeros((b, 4 * self.shift), jnp.float32)
        return state

    # -------------------------------------------------------------- step

    def step(self, state: dict, chunk, chunk_lens=None):
        """One streaming tick. chunk: waves [B, chunk_samples] (fbank
        models) or feats [B, 4*chunk, D] (offline). chunk_lens [B] gives
        the true length of a zero-padded FINAL chunk (defaults to full).
        Returns (new_state, out) with out = {"enc" [B,ch,d] f32,
        "valid" [B,ch] bool, "logits" [B,ch,V] f32 or None}."""
        chunk = jnp.asarray(chunk)
        if chunk_lens is None:
            full = chunk.shape[1]
            chunk_lens = jnp.full((chunk.shape[0],), full, jnp.int32)
        # Loud failure at PE capacity (silent clamping would break the
        # exact-vs-batch contract precisely on long-running streams).
        # chunk_idx is concrete here unless the caller wrapped step() in
        # their own jit — then the decode_waves-style upfront check is
        # the caller's job.
        try:
            cur = int(state["chunk_idx"])
        except (TypeError, jax.errors.ConcretizationTypeError):
            cur = None
        if cur is not None and (cur + 1) * self.chunk - self.phase > self.max_frames:
            raise ValueError(
                f"stream exceeds positional-encoding capacity: chunk "
                f"{cur} would emit encoder frames past max_frames="
                f"{self.max_frames}; construct "
                f"StreamingRecognizer(model, max_frames=...) larger"
            )
        return self._step(self.params, state, chunk, jnp.asarray(chunk_lens, jnp.int32))

    def _step_impl(self, params, state, chunk, chunk_lens):
        ch, L, phase = self.chunk, self.left, self.phase
        b = chunk.shape[0]

        if self.offline:
            feats = chunk.astype(jnp.float32)
            new_wave_cache = None
        else:
            waves = jnp.concatenate(
                [state["wave_cache"], chunk.astype(jnp.float32)], axis=1
            )
            # fbank over [4*shift cache ++ chunk]: emitted frame j is true
            # frame (chunk_idx*4ch + j - 4); frames beyond 4ch belong to
            # the next step (their samples recur via the cache)
            lens = jnp.full((b,), waves.shape[1], jnp.int32)
            feats_all, _ = fbank(waves, lens, self._fbank_cfg)
            feats = feats_all[:, : 4 * ch]
            new_wave_cache = waves[:, -4 * self.shift:]

        # --- x4 conv subsample over [4-frame cache ++ feats] -> exactly
        # ch outputs; emitted encoder slot j is true frame
        # (chunk_idx*ch + j - phase)
        conv_in = jnp.concatenate([state["feat_cache"], feats], axis=1)
        dtype = self.model.module.encoder.dtype
        x, _ = self._sub.apply(
            {"params": params["encoder"]["sub"]},
            conv_in.astype(dtype),
            jnp.full((b,), conv_in.shape[1], jnp.int32),
        )
        new_feat_cache = conv_in[:, -4:]

        # --- positions: global true-frame indices (warm-up slots clamp
        # to 0; they are masked everywhere downstream)
        base = state["chunk_idx"] * ch
        t_idx = base + jnp.arange(ch, dtype=jnp.int32) - phase  # [ch]
        pe = jnp.asarray(_pe_table(self.d_model, self.max_frames))
        pos = jnp.clip(t_idx, 0, pe.shape[0] - 1)
        x = x * (self.d_model ** 0.5) + pe[pos].astype(x.dtype)[None]

        # --- validity: true-frame count per stream after this chunk
        fed = state["fed"] + chunk_lens
        e_true = _enc_frames_of(fed, self.window, self.shift, self.offline)
        key_idx = (
            (state["chunk_idx"] - L) * ch
            + jnp.arange((L + 1) * ch, dtype=jnp.int32)
            - phase
        )  # true frames of [cache ++ current]
        key_ok = (key_idx[None, :] >= 0) & (key_idx[None, :] < e_true[:, None])
        key_bias = jnp.where(key_ok, 0.0, NEG_INF).astype(jnp.float32)
        key_bias = key_bias[:, None, None, :]

        new_kv = {}
        for i in range(self.n_layers):
            name = f"layer{i}"
            cache = state["kv"][name]
            x, k_cur, v_cur = self._layer.apply(
                {"params": params["encoder"][name]},
                x, cache["k"], cache["v"], key_bias,
                method=TransformerEncoderLayer.chunk_step,
            )
            new_kv[name] = {
                "k": jnp.concatenate([cache["k"], k_cur], axis=1)[:, ch:],
                "v": jnp.concatenate([cache["v"], v_cur], axis=1)[:, ch:],
            }
        x = self._final_norm.apply(
            {"params": params["encoder"]["final_norm"]}, x
        )

        out = {
            "enc": x.astype(jnp.float32),
            "valid": (t_idx[None, :] >= 0) & (t_idx[None, :] < e_true[:, None]),
            "logits": None,
        }
        if self._head_name is not None:
            import flax.linen as nn

            head = nn.Dense(
                int(self.model.configs.decoder["vocab_size"]), use_bias=False
            )
            out["logits"] = head.apply(
                {"params": params[self._head_name]}, x
            ).astype(jnp.float32)

        new_state = {
            "kv": new_kv,
            "chunk_idx": state["chunk_idx"] + 1,
            "fed": fed,
            "feat_cache": new_feat_cache,
        }
        if new_wave_cache is not None:
            new_state["wave_cache"] = new_wave_cache
        return new_state, out

    # ------------------------------------------------------ host driving

    def decode_waves(self, inputs, lengths, on_partial=None,
                     partial_beam: int = 0, lm_fusion=None,
                     context_tables=None, context_weight: float = 0.0):
        """Drive a full batch of utterances chunk by chunk (host loop) and
        CTC-decode incrementally.  inputs: [B, N] waves (fbank
        models) or [B, T, D] feats (offline); lengths [B].  Returns
        (hyps: list of id lists, enc [B, E, d], enc_lens [B]) — enc is the
        accumulated encoder state for a final attention/beam pass.
        `on_partial(chunk_idx, hyps)` is called after each chunk with the
        current partial hypotheses.

        partial_beam=0 (default): greedy partials.  partial_beam=N > 0:
        FULL prefix-beam partials — the device beam state
        (ops/ctc_beam_device.py) carries across chunks, so every tick's
        partial is exactly what a one-shot prefix beam over all frames
        so far would produce (bit-identical; chunk boundaries don't
        exist in the recursion), and the final hypotheses are the
        utterance-level prefix-beam 1-best.

        With partial_beam > 0 the beam also carries LM shallow fusion
        and hotword biasing across chunks (the LM cache and phrase
        counters are per-beam state like pb/pnb):

          lm_fusion: dict(step_fn=(lm_params, tokens, cache) ->
            (log_probs, cache), init_cache_fn=(bb, max_tokens) -> cache,
            params=pytree, weight=float, sos_id=int) — build the step
            closure ONCE per process (it is a static jit key; a fresh
            closure per call would retrace).
          context_tables/context_weight: from
            ops.ctc_beam_device.build_context_tables."""
        inputs = np.asarray(inputs)
        lengths = np.asarray(lengths, np.int64)
        b = inputs.shape[0]
        unit = self.chunk_samples if not self.offline else self.chunk_feats
        n_total = inputs.shape[1]
        n_chunks = max(1, math.ceil(n_total / unit))
        if n_chunks * self.chunk - self.phase > self.max_frames:
            raise ValueError(
                f"{n_chunks} chunks of {self.chunk} encoder frames exceed "
                f"positional-encoding capacity max_frames={self.max_frames}"
                "; construct StreamingRecognizer(model, max_frames=...) "
                "larger"
            )
        pad_total = n_chunks * unit - n_total
        if pad_total:
            pad = [(0, 0), (0, pad_total)] + [(0, 0)] * (inputs.ndim - 2)
            inputs = np.pad(inputs, pad)

        blank = None
        if self._head_name is not None:
            blank = int(self.model.configs.decoder["vocab_size"]) - 1
        if partial_beam > 0 and blank is None:
            raise ValueError(
                "partial_beam needs a CTC head (conv-ctc / "
                "conv-ctc-transformer); attention-only models stream "
                "encoder states for the final pass instead"
            )

        beam_state = None
        beam_step_kw = {}
        if partial_beam > 0:
            from openasr_tpu.ops.ctc_beam_device import (
                ctc_beam_stream_init,
                ctc_beam_stream_step,
            )

            init_kw = {}
            if lm_fusion is not None and lm_fusion.get("weight", 0.0):
                max_tokens = n_chunks * self.chunk
                init_kw = {
                    "lm_step_fn": lm_fusion["step_fn"],
                    "init_lm_cache": lm_fusion["init_cache_fn"](
                        b * partial_beam, max_tokens + 1
                    ),
                    "lm_params": lm_fusion["params"],
                    "sos_id": int(lm_fusion.get("sos_id", 1)),
                }
                beam_step_kw.update(
                    lm_step_fn=lm_fusion["step_fn"],
                    lm_weight=float(lm_fusion["weight"]),
                    lm_params=lm_fusion["params"],
                )
            if context_tables is not None and context_weight != 0.0:
                init_kw["num_phrases"] = int(
                    np.shape(context_tables["plen"])[0]
                )
                beam_step_kw.update(
                    context_tables=context_tables,
                    context_weight=float(context_weight),
                )
            beam_state = ctc_beam_stream_init(
                b, partial_beam, max_frames=n_chunks * self.chunk,
                **init_kw,
            )

        state = self.init_state(b)
        hyps: list = [[] for _ in range(b)]
        prev_id = np.full((b,), -1, np.int64)
        enc_chunks = []
        for n in range(n_chunks):
            piece = inputs[:, n * unit:(n + 1) * unit]
            lens = np.clip(lengths - n * unit, 0, unit).astype(np.int32)
            state, out = self.step(state, piece, lens)
            valid = np.asarray(out["valid"])
            enc_chunks.append((np.asarray(out["enc"]), valid))
            if blank is not None and partial_beam > 0:
                log_probs = jax.nn.log_softmax(
                    out["logits"].astype(jnp.float32), axis=-1
                )
                beam_state, (btoks, blens, _) = ctc_beam_stream_step(
                    beam_state, log_probs, jnp.asarray(valid),
                    blank=blank, beam=partial_beam, **beam_step_kw,
                )
                # fetch only the 1-best row — the full [B, N, max_frames]
                # snapshot would move O(chunks * N * max_frames) ints to
                # host over the stream for data the partials never use
                btoks_np = np.asarray(btoks[:, 0])
                blens_np = np.asarray(blens[:, 0])
                hyps = [
                    list(btoks_np[bi, : blens_np[bi]]) for bi in range(b)
                ]
                if on_partial is not None:
                    on_partial(n, [list(h) for h in hyps])
            elif blank is not None:
                ids = np.asarray(jnp.argmax(out["logits"], axis=-1))
                for bi in range(b):
                    for j in range(ids.shape[1]):
                        if not valid[bi, j]:
                            continue
                        tid = int(ids[bi, j])
                        if tid != blank and tid != prev_id[bi]:
                            hyps[bi].append(tid)
                        prev_id[bi] = tid
                if on_partial is not None:
                    on_partial(n, [list(h) for h in hyps])

        enc_lens = np.zeros((b,), np.int32)
        e = sum(c.shape[1] for c, _ in enc_chunks)
        enc = np.zeros((b, e, self.d_model), np.float32)
        for bi in range(b):
            pos = 0
            for c, valid in enc_chunks:
                k = int(valid[bi].sum())
                if k:
                    enc[bi, pos:pos + k] = c[bi][valid[bi]]
                    pos += k
            enc_lens[bi] = pos
        return hyps, enc[:, : int(enc_lens.max() or 1)], enc_lens
