"""Speech model families: Conv_CTC, Conv_Transformer, Conv_CTC_Transformer,
GRU_CTC.

Capability parity with reference: src/frameworks/Speech_Models.py:30-907
(CIF variants live in openasr_tpu/models/cif.py).  Each family is a pure
linen module plus a Framework wrapper exposing create_model / loss /
encode / decode, with losses returned as raw sums + counts so solvers can
apply the reference's normalization (CE by tokens, CTC by sequences).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import Framework, register_model
from openasr_tpu.models.decoder import (
    TransformerDecoder,
    transformer_decoder_from_config,
)
from openasr_tpu.models.encoder import GRUEncoder, TransformerEncoder
from openasr_tpu.models.frontend import SPLayer, WavConv
from openasr_tpu.models.layers import XAVIER_UNIFORM
from openasr_tpu.ops.beam_search import batch_beam_search, beam_expand
from openasr_tpu.ops.ctc import cal_ctc_loss
from openasr_tpu.ops.ctc_decode import ctc_greedy_decode
from openasr_tpu.ops.fbank import fbank_config_from_model_cfg
from openasr_tpu.ops.losses import cal_ce_loss
from openasr_tpu.ops.masks import padding_bias
from openasr_tpu.ops.specaug import spec_aug_config_from_cfg

Dtype = Any


def splayer_from_config(signal_cfg) -> SPLayer:
    """SPLayer deliberately has NO dtype: the signal frontend always runs
    f32 (precision policy, docs/DESIGN.md §6 — fbank feeds log(), where
    bf16 relative error is audible); the encoder casts afterward."""
    signal_cfg = signal_cfg or {}
    spec_cfg = signal_cfg.get("spec_aug")
    return SPLayer(
        feature_type=signal_cfg.get("feature_type", "offline"),
        fbank_config=(
            fbank_config_from_model_cfg(signal_cfg)
            if signal_cfg.get("feature_type") == "fbank"
            else None
        ),
        spec_aug_config=spec_aug_config_from_cfg(spec_cfg) if spec_cfg else None,
        apply_dither=bool(signal_cfg.get("dither", False)),
        name="splayer",
    )


def streaming_phase_of(signal_cfg) -> int:
    """Chunk-mask phase for a streaming encoder (ops/masks.py:chunk_bias):
    2 when the model consumes raw waves through the fbank frontend (the
    streaming executor's fbank stage adds one x4-feature-slot delay on top
    of the subsampler's one conv slot), 1 for offline features."""
    return 2 if (signal_cfg or {}).get("feature_type") == "fbank" else 1


def target_lengths_of(paddings: jnp.ndarray) -> jnp.ndarray:
    """sum(1 - paddings) (reference: Speech_Models.py:112)."""
    return jnp.sum(1.0 - paddings, axis=-1).astype(jnp.int32)


# =========================================================== Conv_Transformer

class ConvTransformerModule(nn.Module):
    """reference: src/frameworks/Speech_Models.py:106-255."""

    splayer: SPLayer
    encoder: TransformerEncoder
    decoder: TransformerDecoder

    def __call__(self, inputs, input_lengths, ids, id_lengths,
                 deterministic: bool = True):
        enc, elens = self.encode(inputs, input_lengths, deterministic)
        return self.decoder(enc, elens, ids, id_lengths, deterministic)

    def encode(self, inputs, input_lengths, deterministic: bool = True):
        x, lens = self.splayer(inputs, input_lengths, deterministic)
        return self.encoder(x, lens, deterministic)

    def init_decode_cache(self, memory, max_len: int):
        return self.decoder.init_cache(memory, max_len)

    def decode_step(self, tokens, index, cache, memory_bias, max_len: int):
        return self.decoder.step(tokens, index, cache, memory_bias, max_len)


@register_model("conv-transformer")
class ConvTransformer(Framework):
    moe_capable = True

    @classmethod
    def build_module(cls, configs: Config, dtype=jnp.float32):
        return ConvTransformerModule(
            splayer=splayer_from_config(configs.signal),
            encoder=TransformerEncoder.from_config(
                configs.encoder, dtype,
                streaming_phase=streaming_phase_of(configs.signal),
            ),
            decoder=transformer_decoder_from_config(configs.decoder, dtype),
        )

    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        module = cls.build_module(configs, dtype)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        inputs, lengths = _example_inputs(configs)
        variables = module.init(
            {"params": rng, "dropout": rng, "aug": rng},
            inputs, lengths, jnp.zeros((2, 4), jnp.int32),
            jnp.array([4, 4], jnp.int32),
        )
        return cls(module, variables["params"], configs)

    def loss(self, params, batch: dict, rngs: dict, train: bool = True,
             label_smooth: float = 0.0) -> dict:
        inputs, lengths = self.batch_inputs(batch)
        tlen = target_lengths_of(batch["paddings"])
        logits, moe_aux = self.apply_with_moe_aux(
            {"params": params}, inputs, lengths, batch["ids"], tlen,
            deterministic=not train, rngs=rngs if train else None,
        )
        ce = cal_ce_loss(logits, batch["labels"], batch["paddings"], label_smooth)
        out = {
            "ce_loss": ce,
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": jnp.asarray(batch["ids"].shape[0], jnp.float32),
        }
        if moe_aux is not None:
            out["moe_aux_loss"] = moe_aux
        return out

    def encode(self, params, inputs, lengths):
        return self.module.apply(
            {"params": params}, inputs, lengths,
            method=type(self.module).encode,
        )

    def batch_beam_decode(self, params, inputs, lengths, beam_size=5,
                          max_decode_len=100, lm=None, lm_params=None,
                          lm_weight=0.0, context_tables=None,
                          context_weight=0.0):
        """reference: Speech_Models.py:136-203; jitted KV-cached version,
        optionally with LSTM-LM shallow fusion (score += lm_weight *
        log p_lm) and Aho-Corasick hotword biasing (context_tables from
        ops.ctc_beam_device.build_context_tables — the same automaton
        the device CTC beam runs)."""
        encoded, elens = self.encode(params, inputs, lengths)
        return self.beam_decode_encoded(
            params, encoded, elens, beam_size=beam_size,
            max_decode_len=max_decode_len, lm=lm, lm_params=lm_params,
            lm_weight=lm_weight, context_tables=context_tables,
            context_weight=context_weight,
        )

    def beam_decode_encoded(self, params, encoded, elens, beam_size=5,
                            max_decode_len=100, lm=None, lm_params=None,
                            lm_weight=0.0, context_tables=None,
                            context_weight=0.0):
        """Beam search over precomputed encoder states — the final
        attention pass of the two-pass streaming recipe (streaming.py
        accumulates `encoded` incrementally, then this rescores)."""
        b = encoded.shape[0]
        enc_bb = beam_expand(encoded, beam_size)
        lens_bb = beam_expand(elens, beam_size)
        memory_bias = padding_bias(lens_bb, enc_bb.shape[1])
        module = self.module
        cache = module.apply(
            {"params": params}, enc_bb, max_decode_len,
            method=type(module).init_decode_cache,
        )

        def step_fn(tokens, index, cache):
            return module.apply(
                {"params": params}, tokens, index, cache, memory_bias,
                max_decode_len, method=type(module).decode_step,
            )

        from openasr_tpu.models.lm import make_lm_fusion

        lm_step_fn, init_lm_cache = make_lm_fusion(
            lm if lm_weight != 0.0 else None, lm_params, b * beam_size,
            max_len=max_decode_len + 1,
        )

        vocab = self.configs.decoder["vocab_size"]
        return batch_beam_search(
            step_fn, cache, b, beam_size, max_decode_len, vocab,
            lm_step_fn=lm_step_fn, init_lm_cache=init_lm_cache,
            lm_weight=lm_weight, context_tables=context_tables,
            context_weight=context_weight,
        )


# ================================================================== Conv_CTC

class ConvCTCModule(nn.Module):
    """reference: src/frameworks/Speech_Models.py:30-103."""

    splayer: SPLayer
    encoder: TransformerEncoder
    vocab_size: int

    @nn.compact
    def __call__(self, inputs, input_lengths, deterministic: bool = True):
        enc, elens = self.encode(inputs, input_lengths, deterministic)
        logits = nn.Dense(
            self.vocab_size, use_bias=False, kernel_init=XAVIER_UNIFORM,
            name="fc",
        )(enc)
        return logits, elens

    def encode(self, inputs, input_lengths, deterministic: bool = True):
        x, lens = self.splayer(inputs, input_lengths, deterministic)
        return self.encoder(x, lens, deterministic)


@register_model("conv-ctc")
class ConvCTC(Framework):
    moe_capable = True

    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        module = ConvCTCModule(
            splayer=splayer_from_config(configs.signal),
            encoder=TransformerEncoder.from_config(
                configs.encoder, dtype,
                streaming_phase=streaming_phase_of(configs.signal),
            ),
            vocab_size=int(configs.decoder["vocab_size"]),
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        inputs, lengths = _example_inputs(configs)
        variables = module.init(
            {"params": rng, "dropout": rng, "aug": rng}, inputs, lengths
        )
        return cls(module, variables["params"], configs)

    def loss(self, params, batch, rngs, train=True, **_):
        inputs, lengths = self.batch_inputs(batch)
        (logits, len_logits), moe_aux = self.apply_with_moe_aux(
            {"params": params}, inputs, lengths,
            deterministic=not train, rngs=rngs if train else None,
        )
        tlen = target_lengths_of(batch["paddings"])
        ctc = cal_ctc_loss(logits, len_logits, batch["labels"], tlen)
        out = {
            "ctc_loss": ctc,
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": jnp.asarray(batch["ids"].shape[0], jnp.float32),
        }
        if moe_aux is not None:
            out["moe_aux_loss"] = moe_aux
        return out

    def get_logits(self, params, inputs, lengths):
        return self.module.apply({"params": params}, inputs, lengths)

    def greedy_decode(self, params, inputs, lengths):
        logits, len_logits = self.get_logits(params, inputs, lengths)
        return ctc_greedy_decode(logits, len_logits)

    def fc_component_names(self):
        return ("fc",)


# ====================================================== Conv_CTC_Transformer

class ConvCTCTransformerModule(ConvTransformerModule):
    """reference: src/frameworks/Speech_Models.py:258-329."""

    @nn.compact
    def __call__(self, inputs, input_lengths, ids, id_lengths,
                 deterministic: bool = True):
        enc, elens = self.encode(inputs, input_lengths, deterministic)
        ctc_logits = nn.Dense(
            self.decoder.vocab_size, use_bias=False,
            kernel_init=XAVIER_UNIFORM, name="ctc_fc",
        )(enc)
        ce_logits = self.decoder(enc, elens, ids, id_lengths, deterministic)
        return ctc_logits, elens, ce_logits


@register_model("conv-ctc-transformer")
class ConvCTCTransformer(ConvTransformer):
    @classmethod
    def build_module(cls, configs: Config, dtype=jnp.float32):
        return ConvCTCTransformerModule(
            splayer=splayer_from_config(configs.signal),
            encoder=TransformerEncoder.from_config(
                configs.encoder, dtype,
                streaming_phase=streaming_phase_of(configs.signal),
            ),
            decoder=transformer_decoder_from_config(configs.decoder, dtype),
        )

    def loss(self, params, batch, rngs, train=True, label_smooth=0.0):
        inputs, lengths = self.batch_inputs(batch)
        tlen = target_lengths_of(batch["paddings"])
        (ctc_logits, len_ctc, ce_logits), moe_aux = self.apply_with_moe_aux(
            {"params": params}, inputs, lengths, batch["ids"], tlen,
            deterministic=not train, rngs=rngs if train else None,
        )
        # CTC targets count "without blk": the trailing EOS is excluded
        # (reference: Speech_Models.py:269 uses target_lengths - 1)
        ctc = cal_ctc_loss(ctc_logits, len_ctc, batch["labels"], tlen - 1)
        ce = cal_ce_loss(ce_logits, batch["labels"], batch["paddings"], label_smooth)
        out = {
            "ctc_loss": ctc,
            "ce_loss": ce,
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": jnp.asarray(batch["ids"].shape[0], jnp.float32),
        }
        if moe_aux is not None:
            out["moe_aux_loss"] = moe_aux
        return out


# ==================================================================== GRU_CTC

class GRUCTCModule(nn.Module):
    """WavConv (x160) -> GRU -> fc -> CTC
    (reference: src/frameworks/Speech_Models.py:826-907)."""

    splayer: WavConv
    encoder: GRUEncoder
    vocab_size: int

    @nn.compact
    def __call__(self, waves, wave_lengths, deterministic: bool = True):
        x, lens = self.splayer(
            waves, wave_lengths, use_running_average=deterministic
        )
        x, lens = self.encoder(x, lens, deterministic)
        logits = nn.Dense(
            self.vocab_size, use_bias=False, kernel_init=XAVIER_UNIFORM,
            name="fc",
        )(x)
        return logits, lens


@register_model("gru_ctc")
class GRUCTC(Framework):
    frozen_components = ()

    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        module = GRUCTCModule(
            splayer=WavConv(d_model=int(configs.signal["d_model"]), dtype=dtype,
                            name="splayer"),
            encoder=GRUEncoder.from_config(configs.encoder, dtype),
            vocab_size=int(configs.decoder["vocab_size"]),
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        waves = jnp.zeros((2, 3200), jnp.float32)
        lengths = jnp.array([3200, 1600], jnp.int32)
        variables = module.init({"params": rng, "dropout": rng}, waves, lengths)
        return cls(
            module, variables["params"], configs,
            batch_stats=variables.get("batch_stats"),
        )

    def loss(self, params, batch, rngs, train=True, batch_stats=None, **_):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        tlen = target_lengths_of(batch["paddings"])
        if train:
            (logits, len_logits), updates = self.module.apply(
                variables, batch["waves"], batch["wave_lengths"],
                deterministic=False, rngs=rngs, mutable=["batch_stats"],
            )
        else:
            logits, len_logits = self.module.apply(
                variables, batch["waves"], batch["wave_lengths"],
                deterministic=True,
            )
            updates = None
        ctc = cal_ctc_loss(logits, len_logits, batch["labels"], tlen)
        out = {
            "ctc_loss": ctc,
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": jnp.asarray(batch["ids"].shape[0], jnp.float32),
        }
        if updates is not None:
            out["batch_stats"] = updates["batch_stats"]
        return out

    def get_logits(self, params, inputs, lengths):
        variables = {"params": params}
        if self.batch_stats is not None:
            variables["batch_stats"] = self.batch_stats
        return self.module.apply(variables, inputs, lengths)

    def greedy_decode(self, params, inputs, lengths):
        logits, len_logits = self.get_logits(params, inputs, lengths)
        return ctc_greedy_decode(logits, len_logits)

    def load_splayer(self, pkg: dict) -> None:
        """Warm-start the WavConv front from a CPC package and freeze it
        (reference: Speech_Models.py:875-881, train_CPC.py:110-114)."""
        new_params = dict(self.params)
        new_params["splayer"] = jax.tree_util.tree_map(
            jnp.asarray, pkg["components"]["splayer"]
        )
        self.params = new_params
        if "batch_stats" in pkg and pkg["batch_stats"] is not None:
            bs = dict(self.batch_stats) if self.batch_stats else {}
            bs["splayer"] = jax.tree_util.tree_map(
                jnp.asarray, pkg["batch_stats"].get("splayer", {})
            )
            self.batch_stats = bs
        self.frozen_components = ("splayer",)

    def fc_component_names(self):
        return ("fc",)


def _example_inputs(configs: Config):
    """Tiny init-time inputs consistent with the signal config."""
    signal = configs.signal or {}
    if signal.get("feature_type") == "fbank":
        return (
            jnp.zeros((2, 1600), jnp.float32),
            jnp.array([1600, 800], jnp.int32),
        )
    d = int(configs.encoder["input_dim"])
    return (
        jnp.zeros((2, 16, d), jnp.float32),
        jnp.array([16, 8], jnp.int32),
    )
