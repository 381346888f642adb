"""Text models: phone->char translation (Embed_Decoder, Embed_Decoder_CTC).

Capability parity with reference: src/frameworks/Text_Models.py:17-146.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import Framework, register_model
from openasr_tpu.models.decoder import (
    TransformerDecoder,
    transformer_decoder_from_config,
)
from openasr_tpu.models.encoder import TransformerEncoder
from openasr_tpu.models.layers import XAVIER_UNIFORM
from openasr_tpu.models.speech import target_lengths_of
from openasr_tpu.ops.beam_search import batch_beam_search, beam_expand
from openasr_tpu.ops.ctc import cal_ctc_loss
from openasr_tpu.ops.ctc_decode import ctc_greedy_decode
from openasr_tpu.ops.losses import cal_ce_loss
from openasr_tpu.ops.masks import padding_bias

Dtype = Any


class EmbedDecoderModule(nn.Module):
    """Embedding 'encoder' -> TransformerDecoder
    (reference: Text_Models.py:17-86)."""

    decoder: TransformerDecoder
    phone_vocab: int
    d_model: int

    def setup(self):
        self.emb = nn.Embed(
            self.phone_vocab, self.d_model,
            embedding_init=nn.initializers.xavier_uniform(),
        )

    def encode(self, phones, phone_lengths):
        return self.emb(phones.astype(jnp.int32)), phone_lengths

    def __call__(self, phones, phone_lengths, ids, id_lengths,
                 deterministic: bool = True):
        memory, mlens = self.encode(phones, phone_lengths)
        return self.decoder(memory, mlens, ids, id_lengths, deterministic)

    def init_decode_cache(self, memory, max_len: int):
        return self.decoder.init_cache(memory, max_len)

    def decode_step(self, tokens, index, cache, memory_bias, max_len: int):
        return self.decoder.step(tokens, index, cache, memory_bias, max_len)


@register_model("Embed_Decoder")
class EmbedDecoder(Framework):
    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        module = EmbedDecoderModule(
            decoder=transformer_decoder_from_config(configs.decoder, dtype),
            phone_vocab=int(configs.encoder["vocab_size"]),
            d_model=int(configs.encoder["d_model"]),
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = module.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, 6), jnp.int32), jnp.array([6, 4], jnp.int32),
            jnp.zeros((2, 4), jnp.int32), jnp.array([4, 4], jnp.int32),
        )
        return cls(module, variables["params"], configs)

    def loss(self, params, batch, rngs, train=True, label_smooth=0.0, **_):
        tlen = target_lengths_of(batch["paddings"])
        logits = self.module.apply(
            {"params": params}, batch["phones"], batch["phone_lengths"],
            batch["ids"], tlen,
            deterministic=not train, rngs=rngs if train else None,
        )
        return {
            "ce_loss": cal_ce_loss(
                logits, batch["labels"], batch["paddings"], label_smooth
            ),
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": jnp.asarray(batch["ids"].shape[0], jnp.float32),
        }

    def batch_beam_decode(self, params, phones, phone_lengths, beam_size=5,
                          max_decode_len=100):
        module = self.module
        memory, mlens = module.apply(
            {"params": params}, phones, phone_lengths,
            method=type(module).encode,
        )
        b = memory.shape[0]
        mem_bb = beam_expand(memory, beam_size)
        lens_bb = beam_expand(mlens, beam_size)
        memory_bias = padding_bias(lens_bb, mem_bb.shape[1])
        cache = module.apply(
            {"params": params}, mem_bb, max_decode_len,
            method=type(module).init_decode_cache,
        )

        def step_fn(tokens, index, cache):
            return module.apply(
                {"params": params}, tokens, index, cache, memory_bias,
                max_decode_len, method=type(module).decode_step,
            )

        vocab = self.configs.decoder["vocab_size"]
        return batch_beam_search(
            step_fn, cache, b, beam_size, max_decode_len, vocab
        )


class EmbedDecoderCTCModule(nn.Module):
    """Embedding -> TransformerEncoder -> ctc_fc (non-autoregressive
    phone->char, reference: Text_Models.py:89-146)."""

    encoder_block: TransformerEncoder
    phone_vocab: int
    d_model: int
    vocab_size: int

    def setup(self):
        self.emb = nn.Embed(
            self.phone_vocab, self.d_model,
            embedding_init=nn.initializers.xavier_uniform(),
        )
        self.ctc_fc = nn.Dense(
            self.vocab_size, use_bias=False, kernel_init=XAVIER_UNIFORM,
        )

    def __call__(self, phones, phone_lengths, deterministic: bool = True):
        x = self.emb(phones.astype(jnp.int32))
        out, out_lengths = self.encoder_block(x, phone_lengths, deterministic)
        return self.ctc_fc(out), out_lengths


@register_model("Embed_Decoder_CTC")
class EmbedDecoderCTC(Framework):
    # the transformer stack is configured by the 'decoder' section
    # (reference naming, Text_Models.py:117-124) — moe lives there too
    moe_capable = True
    moe_section = "decoder"

    @classmethod
    def build_module(cls, configs, dtype=jnp.float32):
        # the reference calls this component 'decoder' in configs although
        # it is an encoder stack (Text_Models.py:117-124)
        enc_cfg = Config(configs.decoder.to_dict())
        if not enc_cfg.get("input_dim"):
            # the stack's input is the EMBEDDING output (encoder.d_model);
            # when the widths differ the encoder's affine front projects
            # emb_dim -> d_model (reference Linear(input_dim, d_model))
            enc_cfg["input_dim"] = int(configs.encoder["d_model"])
        if "sub" not in enc_cfg:
            enc_cfg["sub"] = None
        return EmbedDecoderCTCModule(
            encoder_block=TransformerEncoder.from_config(enc_cfg, dtype),
            phone_vocab=int(configs.encoder["vocab_size"]),
            d_model=int(configs.encoder["d_model"]),
            vocab_size=int(configs.decoder["vocab_size"]),
        )

    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        module = cls.build_module(configs, dtype)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = module.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, 6), jnp.int32), jnp.array([6, 4], jnp.int32),
        )
        return cls(module, variables["params"], configs)

    def loss(self, params, batch, rngs, train=True, **_):
        tlen = target_lengths_of(batch["paddings"])
        (logits, len_logits), moe_aux = self.apply_with_moe_aux(
            {"params": params}, batch["phones"], batch["phone_lengths"],
            deterministic=not train, rngs=rngs if train else None,
        )
        losses = {
            "ctc_loss": cal_ctc_loss(logits, len_logits, batch["labels"], tlen),
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": jnp.asarray(batch["phones"].shape[0], jnp.float32),
        }
        if moe_aux is not None:
            losses["moe_aux_loss"] = moe_aux
        return losses

    def get_logits(self, params, phones, phone_lengths):
        return self.module.apply({"params": params}, phones, phone_lengths)

    def greedy_decode(self, params, phones, phone_lengths):
        logits, len_logits = self.get_logits(params, phones, phone_lengths)
        return ctc_greedy_decode(logits, len_logits)

    def fc_component_names(self):
        return ("ctc_fc",)
