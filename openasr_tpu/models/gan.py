"""WGAN-GP semi-supervised phone2char: generator + discriminator.

Capability parity with reference: src/frameworks/GAN_Models.py:14-91 and
src/frameworks/Discriminators.py:15-85.  G is the non-autoregressive
Embed_Decoder_CTC; D scores token-probability sequences; training combines
a supervised CTC term, a G term (maximize D on shrunk G outputs), and a
Wasserstein D term with gradient penalty (via jax.grad on interpolates).

Two reference bugs fixed (behavior documented):
  * D's input mask used the vocab dim as depth (Discriminators.py:23-25);
    here the TIME dimension is masked;
  * gradient-penalty norms are taken over (time, vocab) jointly per
    example (the reference normed over time only).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import Framework, register_model
from openasr_tpu.models.layers import XAVIER_UNIFORM
from openasr_tpu.models.speech import target_lengths_of
from openasr_tpu.models.subsample import Conv2dSubsampleV2
from openasr_tpu.models.text import EmbedDecoderCTC, EmbedDecoderCTCModule
from openasr_tpu.ops.ctc import cal_ctc_loss
from openasr_tpu.ops.ctc_decode import ctc_shrink_soft
from openasr_tpu.ops.masks import sequence_mask

Dtype = Any

class DiscriminatorModule(nn.Module):
    """Conv2dSubsampleV2 encoder -> linear -> mean-pooled scalar score
    (reference: Discriminators.py:15-35).

    Deliberate deviation: the temporal mean is LENGTH-NORMALIZED (masked
    mean over each sample's valid encoded frames).  The reference divides
    by the batch-max time after slicing (Discriminators.py:33 `.mean(1)`
    over inputs sliced to lengths.max()), which makes both the scores and
    the WGAN gradient-penalty magnitude depend on how the batch happened
    to be padded — under static-shape bucketing that dependence would
    vary with the quantization ladder, so the masked mean (invariant to
    padding) is the faithful-in-spirit choice."""

    d_input: int
    d_model: int
    layer_num: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Conv2dSubsampleV2(
            self.d_input, self.d_model, self.layer_num, self.dtype
        )
        self.score_fc = nn.Dense(
            1, use_bias=False, kernel_init=XAVIER_UNIFORM, dtype=self.dtype
        )

    def __call__(self, inputs, lengths):
        """inputs [B, T, V] probability sequences -> scores [B]."""
        t = inputs.shape[1]
        valid = sequence_mask(lengths, t, dtype=jnp.float32)
        x = inputs * valid[:, :, None]
        # reference pads short sequences so the conv stack fits
        # (Discriminators.py:31-32)
        min_t = 4 * self.layer_num + 4
        if t < min_t:
            x = jnp.pad(x, ((0, 0), (0, min_t - t), (0, 0)))
        encoded, enc_lens = self.encoder(x, lengths)
        scores = self.score_fc(encoded)[..., 0]
        m = sequence_mask(enc_lens, encoded.shape[1], dtype=jnp.float32)
        return jnp.sum(scores * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0
        )


class GANModule(nn.Module):
    """Container binding G and D under one param tree."""

    G: EmbedDecoderCTCModule
    D: DiscriminatorModule

    def __call__(self, phones, phone_lengths, deterministic: bool = True):
        return self.G(phones, phone_lengths, deterministic)

    def g_logits(self, phones, phone_lengths, deterministic: bool = True):
        return self.G(phones, phone_lengths, deterministic)

    def d_score(self, probs, lengths):
        return self.D(probs, lengths)


@register_model("gan_phone2char")
class GANPhone2Char(Framework):
    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        g_cfg = Config(configs.G or {"encoder": configs.encoder,
                                     "decoder": configs.decoder})
        d_cfg = configs.D
        module = GANModule(
            G=EmbedDecoderCTC.build_module(g_cfg, dtype),
            D=DiscriminatorModule(
                d_input=int(d_cfg["encoder"]["d_input"]),
                d_model=int(d_cfg["encoder"]["d_model"]),
                layer_num=int(d_cfg["encoder"].get("layer_num", 2)),
                dtype=dtype,
            ),
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        phones = jnp.zeros((2, 16), jnp.int32)
        plens = jnp.array([16, 12], jnp.int32)
        variables = module.init({"params": rng, "dropout": rng}, phones, plens)
        # touch D so its params exist
        vocab = int(g_cfg.decoder["vocab_size"])
        probs = jnp.zeros((2, 16, vocab), jnp.float32)
        d_vars = module.init(
            {"params": jax.random.fold_in(rng, 7)}, probs, plens,
            method=GANModule.d_score,
        )
        params = dict(variables["params"])
        params.update(d_vars["params"])
        self_cfg = Config({"G": g_cfg.to_dict(), "D": d_cfg.to_dict(),
                           "type": "gan_phone2char"})
        return cls(module, params, self_cfg)

    # ----------------------------------------------------------- sub-losses

    def _g_probs(self, params, phones, phone_lengths, train, rngs):
        logits, len_logits = self.module.apply(
            {"params": params}, phones, phone_lengths,
            deterministic=not train, rngs=rngs if train else None,
            method=GANModule.g_logits,
        )
        shrunk, len_shrunk = ctc_shrink_soft(logits, len_logits)
        return jax.nn.softmax(shrunk, -1), len_shrunk

    def _d_score(self, params, probs, lengths):
        return self.module.apply(
            {"params": params}, probs, lengths, method=GANModule.d_score
        )

    def supervised_loss(self, params, batch, rngs, train=True):
        """Paired CTC term (reference: GAN_Models.py:22-23 via G.forward)."""
        tlen = target_lengths_of(batch["paddings"])
        logits, len_logits = self.module.apply(
            {"params": params}, batch["phones"], batch["phone_lengths"],
            deterministic=not train, rngs=rngs if train else None,
            method=GANModule.g_logits,
        )
        return cal_ctc_loss(logits, len_logits, batch["labels"], tlen)

    def loss_G(self, params, phones, phone_lengths, rngs, train=True):
        """Generator: maximize D on shrunk softmax outputs, D frozen
        (reference: GAN_Models.py:25-32)."""
        params_frozen_d = dict(params, D=jax.lax.stop_gradient(params["D"]))
        probs, lens = self._g_probs(
            params_frozen_d, phones, phone_lengths, train, rngs
        )
        return -jnp.sum(self._d_score(params_frozen_d, probs, lens))

    def loss_D(self, params, phones, phone_lengths, text, text_lengths,
               rng, gp_weight=1.0):
        """Wasserstein: score(fake) - score(real) + gradient penalty
        (reference: GAN_Models.py:34-58, Discriminators.py:37-55)."""
        g_stopped = jax.lax.stop_gradient(
            self._g_probs(params, phones, phone_lengths, False, None)
        )
        probs_g, len_g = g_stopped
        vocab = probs_g.shape[-1]
        score_neg = jnp.sum(self._d_score(params, probs_g, len_g))

        real = jax.nn.one_hot(text.astype(jnp.int32), vocab)
        score_pos = jnp.sum(self._d_score(params, real, text_lengths))

        # gradient penalty on interpolates (time-padded to a common T)
        t = max(probs_g.shape[1], real.shape[1])
        probs_g = jnp.pad(probs_g, ((0, 0), (0, t - probs_g.shape[1]), (0, 0)))
        real = jnp.pad(real, ((0, 0), (0, t - real.shape[1]), (0, 0)))
        lengths = jnp.minimum(len_g, text_lengths)
        alpha = jax.random.uniform(rng, (probs_g.shape[0], 1, 1))
        interp = alpha * real + (1.0 - alpha) * probs_g

        def d_sum(x):
            return jnp.sum(self._d_score(params, x, lengths))

        grads = jax.grad(d_sum)(interp)
        norms = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2)) + 1e-12)
        gp = jnp.mean((norms - 1.0) ** 2)
        return score_neg - score_pos + gp_weight * gp

    def loss(self, params, batch, rngs, train=True, **_):
        """Combined per-iteration loss: supervised + G + D terms.  The
        reference accumulates all three backward passes into the same grads
        (solvers/phone2char.py:275-318); summing is gradient-identical."""
        sup = self.supervised_loss(params, batch, rngs, train)
        n_seqs = jnp.asarray(batch["phones"].shape[0], jnp.float32)
        losses = {
            "ctc_loss": sup,
            "n_tokens": jnp.sum(1.0 - batch["paddings"]),
            "n_seqs": n_seqs,
        }
        if "unpaired_phones" in batch:
            losses["g_loss"] = self.loss_G(
                params, batch["unpaired_phones"],
                batch["unpaired_phone_lengths"], rngs, train,
            )
        if "unpaired_text" in batch:
            gp_rng = (rngs or {}).get("aug", jax.random.PRNGKey(0))
            losses["d_loss"] = self.loss_D(
                params,
                batch.get("unpaired_phones", batch["phones"]),
                batch.get("unpaired_phone_lengths", batch["phone_lengths"]),
                batch["unpaired_text"], batch["unpaired_text_lengths"],
                gp_rng,
            )
        return losses

    def restore_G(self, pkg: dict) -> None:
        """Warm-start the generator from an Embed_Decoder_CTC package
        (reference: GAN_Models.py:87-91)."""
        new_params = dict(self.params)
        g = dict(new_params["G"])
        for name, state in pkg["components"].items():
            g[name] = jax.tree_util.tree_map(jnp.asarray, state)
        new_params["G"] = g
        self.params = new_params

    def fc_component_names(self):
        return ()
