"""CPC self-supervised pretraining model.

Capability parity with reference: src/frameworks/CPC_Models.py:10-139.

TPU re-design: the reference slices `z[:, :t+1]` with a Python-random
anchor and runs the GRU on the dynamic-length prefix.  Because the GRU is
unidirectional, running it over the FULL padded sequence and gathering the
output at the anchor is mathematically identical and keeps shapes static;
the anchor and negative indices are drawn from JAX PRNG keys instead of
Python `random`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import Framework, register_model
from openasr_tpu.models.encoder import GRUEncoder
from openasr_tpu.models.frontend import WavConv

Dtype = Any


class CPCModule(nn.Module):
    """WavConv (x160) -> GRU context -> per-step prediction heads Wk ->
    dot-product contrastive grid."""

    splayer: WavConv
    d_input: int     # coding dim of WavConv outputs (512 in the reference)
    d_coding: int    # GRU hidden (256)
    n_layers: int
    n_steps: int     # prediction horizon
    dtype: Dtype = jnp.float32

    def setup(self):
        self.rnn = GRUEncoder(
            d_input=self.d_input, d_model=self.d_coding,
            n_layers=self.n_layers, dtype=self.dtype,
        )
        self.mappings = [
            nn.Dense(self.d_input, dtype=self.dtype) for _ in range(self.n_steps)
        ]

    def __call__(
        self,
        waves: jnp.ndarray,
        wave_lengths: jnp.ndarray,
        t_samples: jnp.ndarray,
        neg_idx: jnp.ndarray,
        deterministic: bool = True,
    ):
        """t_samples: [] int32 anchor; neg_idx: [B] int32 negative example
        per row.  Returns (acc, loss)."""
        z, len_z = self.splayer(
            waves, wave_lengths, use_running_average=deterministic
        )
        b = z.shape[0]

        # targets: softmax(z[:, t+1 .. t+K]) (reference: CPC_Models.py:40-42)
        z_f32 = z.astype(jnp.float32)
        target_win = jax.lax.dynamic_slice_in_dim(
            z_f32, t_samples + 1, self.n_steps, axis=1
        )  # [B, K, C]
        encode_samples = jax.nn.softmax(target_win, axis=-1)

        # context: GRU output at the anchor (full-scan + gather == prefix run)
        output, _ = self.rnn(z, len_z, deterministic=True)
        c_t = jax.lax.dynamic_slice_in_dim(
            output, t_samples, 1, axis=1
        )[:, 0].astype(jnp.float32)  # [B, H]

        preds = jnp.stack(
            [jax.nn.softmax(m(c_t).astype(jnp.float32), -1)
             for m in self.mappings],
            axis=1,
        )  # [B, K, C]

        # prob grid over the batch: [K, B_target, B_pred]
        prob = jnp.einsum("ikc,jkc->kij", encode_samples, preds)
        diag = jnp.einsum("kii->ki", prob)  # [K, B]
        neg = jnp.take_along_axis(
            prob, neg_idx[None, :, None].repeat(self.n_steps, 0), axis=2
        )[..., 0]  # [K, B]

        loss = jnp.sum(1.0 - diag) + jnp.sum(neg)
        n_correct = jnp.sum(diag > 0.5) + jnp.sum(neg < 0.5)
        acc = n_correct / (b * self.n_steps * 2)
        return acc, loss


@register_model("encoder_cpc")
class CPCModel(Framework):
    @classmethod
    def create_model(cls, configs, rng=None, dtype=jnp.float32):
        configs = Config(configs)
        cpc_cfg = configs.cpc or configs.decoder or {}
        module = CPCModule(
            splayer=WavConv(d_model=int(configs.signal["d_model"]),
                            dtype=dtype, name="splayer"),
            d_input=int(cpc_cfg.get("d_input", configs.signal["d_model"])),
            d_coding=int(cpc_cfg.get("d_coding", 256)),
            n_layers=int(cpc_cfg.get("n_layers", 1)),
            n_steps=int(cpc_cfg.get("n_steps", 12)),
            dtype=dtype,
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        n = 160 * (module.n_steps + 8)
        waves = jnp.zeros((2, n), jnp.float32)
        lengths = jnp.array([n, n], jnp.int32)
        variables = module.init(
            {"params": rng, "dropout": rng},
            waves, lengths, jnp.asarray(2, jnp.int32),
            jnp.array([1, 0], jnp.int32),
        )
        return cls(
            module, variables["params"], configs,
            batch_stats=variables.get("batch_stats"),
        )

    def loss(self, params, batch, rngs, train=True, batch_stats=None, **_):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        waves = batch["waves"]
        lengths = batch["wave_lengths"]
        b = waves.shape[0]
        n_steps = self.module.n_steps

        # anchor in [1, min_len_z - K - 1] (reference: CPC_Models.py:36)
        min_len_z = jnp.min(lengths) // 160
        # randint's maxval is EXCLUSIVE while the reference's
        # random.randint(1, min_len - K - 1) is inclusive: the exclusive
        # bound is min_len - K, so the last legal anchor (prediction
        # window ending exactly at the shortest utterance's final frame)
        # is reachable (reference: CPC_Models.py:36)
        hi = jnp.maximum(min_len_z - n_steps, 2)
        key = rngs.get("aug", jax.random.PRNGKey(0)) if rngs else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        t_samples = jax.random.randint(k1, (), 1, hi)
        # negative: random other row (reference: CPC_Models.py:58)
        offset = jax.random.randint(k2, (b,), 1, b)
        neg_idx = (jnp.arange(b) + offset) % b

        if train:
            (acc, loss), updates = self.module.apply(
                variables, waves, lengths, t_samples, neg_idx,
                deterministic=False, rngs=rngs, mutable=["batch_stats"],
            )
        else:
            acc, loss = self.module.apply(
                variables, waves, lengths, t_samples, neg_idx,
                deterministic=True,
            )
            updates = None
        out = {
            "cpc_loss": loss,
            "acc": acc,
            "n_tokens": jnp.asarray(b, jnp.float32),
            "n_seqs": jnp.asarray(b, jnp.float32),
        }
        if updates is not None:
            out["batch_stats"] = updates["batch_stats"]
        return out

    def fc_component_names(self):
        return ("mappings",)
