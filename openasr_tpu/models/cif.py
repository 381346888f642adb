"""CIF model families: CIF, CTC_CIF, CIF_FC, CIF_MIX.

Capability parity with reference: src/frameworks/Speech_Models.py:332-823.
The integrate-and-fire loop is the jittable scan in openasr_tpu.ops.cif;
the fired-frame gather is a fixed-capacity scatter (training capacity =
padded target length, decode capacity = max_decode_len).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import Framework, register_model
from openasr_tpu.models.assigner import AttentionAssigner
from openasr_tpu.models.decoder import (
    CIFDecoder,
    TransformerDecoder,
    cif_decoder_from_config,
    transformer_decoder_from_config,
)
from openasr_tpu.models.encoder import TransformerEncoder
from openasr_tpu.models.frontend import SPLayer
from openasr_tpu.models.layers import XAVIER_UNIFORM
from openasr_tpu.models.speech import (
    _example_inputs,
    splayer_from_config,
    target_lengths_of,
)
from openasr_tpu.ops.beam_search import batch_beam_search, beam_expand
from openasr_tpu.ops.cif import cif, cif_output_lengths, scale_alphas
from openasr_tpu.ops.ctc import cal_ctc_loss
from openasr_tpu.ops.losses import cal_ce_loss, cal_qua_loss
from openasr_tpu.ops.masks import sequence_mask

Dtype = Any


class CIFModule(nn.Module):
    """Shared CIF body: encode -> alphas -> [optional ctc head] ->
    scaled integrate-and-fire -> head(s)."""

    splayer: SPLayer
    encoder: TransformerEncoder
    assigner: AttentionAssigner
    decoder: Optional[CIFDecoder] = None          # CIF / CTC_CIF
    char_decoder: Optional[TransformerDecoder] = None  # CIF_MIX
    vocab_size: int = 0                           # phone/ctc head width
    use_ctc: bool = False
    use_phone_fc: bool = False
    threshold: float = 0.95

    def setup(self):
        if self.use_ctc:
            self.ctc_fc = nn.Dense(
                self.vocab_size, use_bias=False, kernel_init=XAVIER_UNIFORM,
            )
        if self.use_phone_fc:
            self.phone_fc = nn.Dense(
                self.vocab_size, use_bias=False, kernel_init=XAVIER_UNIFORM,
            )

    def encode(self, inputs, input_lengths, deterministic: bool = True):
        x, lens = self.splayer(inputs, input_lengths, deterministic)
        return self.encoder(x, lens, deterministic)

    def assigner_alphas(self, encoded, lengths, deterministic: bool = True):
        return self.assigner(encoded, lengths, deterministic)

    def __call__(
        self,
        inputs,
        input_lengths,
        target_lengths,
        ids,
        char_ids=None,
        char_lengths=None,
        deterministic: bool = True,
    ):
        """Returns dict with raw_num, optional ctc_logits/ctc_lengths,
        and logits from whichever heads this family has."""
        enc, elens = self.encode(inputs, input_lengths, deterministic)
        out = {}
        if self.use_ctc:
            out["ctc_logits"] = self.ctc_fc(enc)
            out["ctc_lengths"] = elens

        alphas = self.assigner_alphas(enc, elens, deterministic)
        noise_key = None
        if not deterministic:
            noise_key = self.make_rng("aug")
        alphas, raw_num = scale_alphas(alphas, target_lengths, noise_key)
        out["raw_num"] = raw_num

        cif_out = cif(enc, alphas, ids.shape[1], self.threshold)

        if self.use_phone_fc:
            out["phone_logits"] = self.phone_fc(cif_out)
        if self.decoder is not None:
            out["logits"] = self.decoder(
                cif_out, ids, target_lengths, deterministic
            )
        if self.char_decoder is not None and char_ids is not None:
            out["char_logits"] = self.char_decoder(
                cif_out, target_lengths, char_ids, char_lengths, deterministic
            )
        return out

    def get_encoded(self, inputs, input_lengths, capacity: int):
        """Inference path: unscaled alphas, length = round(sum(alpha))
        (reference: Speech_Models.py:415-421)."""
        enc, elens = self.encode(inputs, input_lengths, True)
        alphas = self.assigner_alphas(enc, elens, True)
        lengths = cif_output_lengths(alphas)
        cif_out = cif(enc, alphas, capacity, self.threshold)
        return cif_out, lengths

    def decode_step(self, encoded, encoded_lengths, prefix, t):
        return self.decoder.step(encoded, encoded_lengths, prefix, t)

    def phone_logits_of(self, cif_out):
        # decode-time phone head (CIF_FC / CIF_MIX)
        return self.phone_fc(cif_out)


def _assigner_from(configs, dtype):
    return AttentionAssigner.from_config(configs.assigner, dtype)


@register_model("CIF")
class CIF(Framework):
    """qua + ce losses (reference: Speech_Models.py:332-540)."""

    use_ctc = False
    moe_capable = True

    @classmethod
    def build_module(cls, configs, dtype=jnp.float32):
        return CIFModule(
            splayer=splayer_from_config(configs.signal),
            encoder=TransformerEncoder.from_config(configs.encoder, dtype),
            assigner=_assigner_from(configs, dtype),
            decoder=cif_decoder_from_config(configs.decoder, dtype),
            vocab_size=int(configs.decoder["vocab_size"]),
            use_ctc=cls.use_ctc,
        )

    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        module = cls.build_module(configs, dtype)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        inputs, lengths = _example_inputs(configs)
        variables = module.init(
            {"params": rng, "dropout": rng, "aug": rng},
            inputs, lengths, jnp.array([3, 3], jnp.int32),
            ids=jnp.zeros((2, 4), jnp.int32),
        )
        return cls(module, variables["params"], configs)

    def loss(self, params, batch, rngs, train=True, label_smooth=0.0):
        inputs, lengths = self.batch_inputs(batch)
        tlen = target_lengths_of(batch["paddings"])
        out, moe_aux = self.apply_with_moe_aux(
            {"params": params}, inputs, lengths, tlen, ids=batch["ids"],
            deterministic=not train, rngs=rngs if train else None,
        )
        losses = {
            "qua_loss": cal_qua_loss(out["raw_num"], tlen),
            "ce_loss": cal_ce_loss(
                out["logits"], batch["labels"], batch["paddings"], label_smooth
            ),
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": jnp.asarray(batch["ids"].shape[0], jnp.float32),
        }
        if self.use_ctc:
            losses["ctc_loss"] = cal_ctc_loss(
                out["ctc_logits"], out["ctc_lengths"], batch["labels"], tlen
            )
        if moe_aux is not None:
            losses["moe_aux_loss"] = moe_aux
        return losses

    def get_encoded(self, params, inputs, lengths, capacity: int):
        return self.module.apply(
            {"params": params}, inputs, lengths, capacity,
            method=type(self.module).get_encoded,
        )

    def batch_beam_decode(self, params, inputs, lengths, beam_size=5,
                          max_decode_len=100, lm=None, lm_params=None,
                          lm_weight=0.0, context_tables=None,
                          context_weight=0.0):
        """Beam over CIF outputs: fixed number of steps = CIF length
        (reference: Speech_Models.py:426-485).  The per-step decoder is the
        reference's pad-and-index full forward; the prefix buffer rides in
        the beam-search cache so reordering follows beams.  Optional
        LSTM-LM shallow fusion matches the attention models'
        (speech.py:batch_beam_decode)."""
        encoded, cif_lens = self.get_encoded(params, inputs, lengths,
                                             max_decode_len)
        b = encoded.shape[0]
        enc_bb = beam_expand(encoded, beam_size)
        lens_bb = beam_expand(jnp.minimum(cif_lens, max_decode_len), beam_size)
        module = self.module

        cache = {"prefix": jnp.zeros((b * beam_size, max_decode_len), jnp.int32)}

        def step_fn(tokens, index, cache):
            prefix = jax.lax.dynamic_update_slice_in_dim(
                cache["prefix"], tokens[:, None], index, axis=1
            )
            logits = module.apply(
                {"params": params}, enc_bb, lens_bb, prefix, index + 1,
                method=type(module).decode_step,
            )
            return logits, {"prefix": prefix}

        from openasr_tpu.models.lm import make_lm_fusion

        lm_step_fn, init_lm_cache = make_lm_fusion(
            lm if lm_weight != 0.0 else None, lm_params, b * beam_size,
            max_len=max_decode_len + 1,
        )

        vocab = self.configs.decoder["vocab_size"]
        # use_eos=False: the reference emits exactly one token per CIF
        # position with no EOS finishing — early EOS stopping would both
        # truncate hypotheses and freeze their scores mid-decode
        # (Speech_Models.py:426-485 loops over every encoded position)
        preds, _, scores = batch_beam_search(
            step_fn, cache, b, beam_size, max_decode_len, vocab,
            lm_step_fn=lm_step_fn, init_lm_cache=init_lm_cache,
            lm_weight=lm_weight, use_eos=False,
            context_tables=context_tables, context_weight=context_weight,
        )
        # output length IS the CIF length
        cif_lens_b = jnp.minimum(cif_lens, max_decode_len)[:, None]
        lens = jnp.broadcast_to(cif_lens_b, scores.shape).astype(jnp.int32)
        return preds, lens, scores

    def fc_component_names(self):
        return ("decoder", "ctc_fc")


@register_model("ctc_cif")
class CTCCIF(CIF):
    """ctc + qua + ce (reference: Speech_Models.py:543-616)."""

    use_ctc = True


@register_model("CIF_FC")
class CIFFC(Framework):
    """Phone-level CIF: ctc + qua + ce_phone over a linear head
    (reference: Speech_Models.py:619-711).  Note: phone paddings derive
    from phone_lengths (the reference used `phone.eq(0)`, a bug since its
    phones padded with id 1)."""

    moe_capable = True

    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        module = CIFModule(
            splayer=splayer_from_config(configs.signal),
            encoder=TransformerEncoder.from_config(configs.encoder, dtype),
            assigner=_assigner_from(configs, dtype),
            vocab_size=int(configs.decoder["vocab_size"]),
            use_ctc=True,
            use_phone_fc=True,
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        inputs, lengths = _example_inputs(configs)
        variables = module.init(
            {"params": rng, "dropout": rng, "aug": rng},
            inputs, lengths, jnp.array([3, 3], jnp.int32),
            ids=jnp.zeros((2, 4), jnp.int32),
        )
        return cls(module, variables["params"], configs)

    def loss(self, params, batch, rngs, train=True, label_smooth=0.0):
        inputs, lengths = self.batch_inputs(batch)
        phones = batch["phones"]
        plen = batch["phone_lengths"]
        phone_paddings = 1.0 - sequence_mask(
            plen, phones.shape[1], dtype=jnp.float32
        )
        out, moe_aux = self.apply_with_moe_aux(
            {"params": params}, inputs, lengths, plen, ids=phones,
            deterministic=not train, rngs=rngs if train else None,
        )
        losses = {
            "ctc_loss": cal_ctc_loss(
                out["ctc_logits"], out["ctc_lengths"], phones, plen
            ),
            "qua_loss": cal_qua_loss(out["raw_num"], plen),
            "ce_loss": cal_ce_loss(
                out["phone_logits"], phones, phone_paddings, label_smooth
            ),
            "n_tokens": jnp.sum(1.0 - phone_paddings),
            "n_seqs": jnp.asarray(phones.shape[0], jnp.float32),
        }
        if moe_aux is not None:
            losses["moe_aux_loss"] = moe_aux
        return losses

    def greedy_phone_decode(self, params, inputs, lengths, max_decode_len=100):
        cif_out, cif_lens = self.module.apply(
            {"params": params}, inputs, lengths, max_decode_len,
            method=type(self.module).get_encoded,
        )
        logits = self.module.apply(
            {"params": params}, cif_out,
            method=type(self.module).phone_logits_of,
        )
        return jnp.argmax(logits, -1), jnp.minimum(cif_lens, max_decode_len)

    def fc_component_names(self):
        return ("ctc_fc", "phone_fc")


@register_model("CIF_MIX")
class CIFMIX(CIFFC):
    """CIF_FC + char TransformerDecoder on CIF outputs; dual-mode forward
    for acoustic-only vs paired batches (reference: Speech_Models.py:714-823)."""

    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        module = CIFModule(
            splayer=splayer_from_config(configs.signal),
            encoder=TransformerEncoder.from_config(configs.encoder, dtype),
            assigner=_assigner_from(configs, dtype),
            char_decoder=transformer_decoder_from_config(configs.decoder, dtype),
            vocab_size=int(configs.get("phone_size")
                           or configs.assigner.get("phone_size")
                           or configs.decoder["vocab_size"]),
            use_ctc=True,
            use_phone_fc=True,
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        inputs, lengths = _example_inputs(configs)
        variables = module.init(
            {"params": rng, "dropout": rng, "aug": rng},
            inputs, lengths, jnp.array([3, 3], jnp.int32),
            ids=jnp.zeros((2, 4), jnp.int32),
            char_ids=jnp.zeros((2, 4), jnp.int32),
            char_lengths=jnp.array([4, 4], jnp.int32),
        )
        return cls(module, variables["params"], configs)

    def loss(self, params, batch, rngs, train=True, label_smooth=0.0):
        """Acoustic batches carry feats+phones; paired batches additionally
        carry char ids/labels/paddings (reference: Speech_Models.py:720-759)."""
        inputs, lengths = self.batch_inputs(batch)
        phones = batch["phones"]
        plen = batch["phone_lengths"]
        phone_paddings = 1.0 - sequence_mask(
            plen, phones.shape[1], dtype=jnp.float32
        )
        paired = "ids" in batch
        kwargs = {}
        if paired:
            kwargs = {
                "char_ids": batch["ids"],
                "char_lengths": target_lengths_of(batch["paddings"]),
            }
        out, moe_aux = self.apply_with_moe_aux(
            {"params": params}, inputs, lengths, plen, ids=phones,
            deterministic=not train, rngs=rngs if train else None, **kwargs,
        )
        losses = {
            "ctc_loss": cal_ctc_loss(
                out["ctc_logits"], out["ctc_lengths"], phones, plen
            ),
            "qua_loss": cal_qua_loss(out["raw_num"], plen),
            "ce_loss": cal_ce_loss(
                out["phone_logits"], phones, phone_paddings, label_smooth
            ),
            "n_tokens": jnp.sum(1.0 - phone_paddings),
            "n_seqs": jnp.asarray(phones.shape[0], jnp.float32),
        }
        if moe_aux is not None:
            losses["moe_aux_loss"] = moe_aux
        if paired:
            losses["ce_char_loss"] = cal_ce_loss(
                out["char_logits"], batch["labels"], batch["paddings"],
                label_smooth,
            )
            losses["n_char_tokens"] = jnp.sum(1.0 - batch["paddings"])
        return losses

    def fc_component_names(self):
        return ("ctc_fc", "phone_fc", "char_decoder")
