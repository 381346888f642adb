"""Tests for CPC, phone2char text models, WGAN-GP, and LMs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class


# ------------------------------------------------------------------- CPC

def cpc_config():
    return Config({
        "type": "encoder_cpc",
        "signal": {"d_model": 64},
        "cpc": {"d_input": 64, "d_coding": 32, "n_layers": 1, "n_steps": 4},
    })


def test_cpc_pretrain_loss_and_stats():
    cfg = cpc_config()
    m = get_model_class("encoder_cpc").create_model(cfg)
    assert m.batch_stats is not None  # WavConv BatchNorm
    rng = np.random.RandomState(0)
    n = 160 * 24
    batch = {
        "waves": rng.randn(4, n).astype(np.float32),
        "wave_lengths": np.array([n, n, n - 320, n - 640], np.int32),
    }
    rngs = {"dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    out = m.loss(m.params, batch, rngs, train=True,
                 batch_stats=m.batch_stats)
    assert np.isfinite(float(out["cpc_loss"]))
    assert 0.0 <= float(out["acc"]) <= 1.0
    assert "batch_stats" in out

    # eval path without updates
    out2 = m.loss(m.params, batch, {"aug": jax.random.PRNGKey(2)},
                  train=False, batch_stats=m.batch_stats)
    assert "batch_stats" not in out2


def test_gru_ctc_warm_start_from_cpc():
    cpc = get_model_class("encoder_cpc").create_model(cpc_config())
    pkg = cpc.package()

    cfg = Config({
        "type": "gru_ctc",
        "signal": {"d_model": 64},
        "encoder": {"d_input": 64, "d_model": 32, "n_layers": 1, "dropout": 0.0},
        "decoder": {"vocab_size": 10},
    })
    m = get_model_class("gru_ctc").create_model(cfg)
    m.load_splayer(pkg)
    assert m.frozen_components == ("splayer",)
    np.testing.assert_array_equal(
        np.asarray(m.params["splayer"]["conv0"]["kernel"]),
        np.asarray(pkg["components"]["splayer"]["conv0"]["kernel"]),
    )

    rng = np.random.RandomState(0)
    n = 160 * 16
    batch = {
        "waves": rng.randn(2, n).astype(np.float32),
        "wave_lengths": np.array([n, n - 320], np.int32),
        "ids": np.array([[1, 3, 4], [1, 5, 2]], np.int32),
        "labels": np.array([[3, 4, 2], [5, 2, 2]], np.int32),
        "paddings": np.array([[0, 0, 0], [0, 0, 1]], np.float32),
    }
    out = m.loss(m.params, batch, {"dropout": jax.random.PRNGKey(0)},
                 train=True, batch_stats=m.batch_stats)
    assert np.isfinite(float(out["ctc_loss"]))


# -------------------------------------------------------------- phone2char

def p2c_configs():
    return Config({
        "type": "Embed_Decoder",
        "encoder": {"vocab_size": 15, "d_model": 32},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 20,
                    "d_model": 32, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 32, "dim_feedforward": 64,
                    "activation": "relu", "dropout_rate": 0.0},
    })


def p2c_batch():
    rng = np.random.RandomState(0)
    return {
        "phones": rng.randint(3, 14, (3, 7)).astype(np.int32),
        "phone_lengths": np.array([7, 5, 4], np.int32),
        "ids": rng.randint(3, 19, (3, 5)).astype(np.int32),
        "labels": rng.randint(3, 19, (3, 5)).astype(np.int32),
        "paddings": np.array([[0, 0, 0, 0, 0], [0, 0, 0, 1, 1],
                              [0, 0, 1, 1, 1]], np.float32),
    }


def test_embed_decoder_loss_and_beam():
    m = get_model_class("Embed_Decoder").create_model(p2c_configs())
    batch = p2c_batch()
    out = m.loss(m.params, batch, {"dropout": jax.random.PRNGKey(0)}, train=True)
    assert np.isfinite(float(out["ce_loss"]))
    preds, lens, scores = m.batch_beam_decode(
        m.params, batch["phones"], batch["phone_lengths"], beam_size=3,
        max_decode_len=8,
    )
    assert preds.shape == (3, 3, 8)


def test_embed_decoder_ctc_loss_and_greedy():
    cfg = p2c_configs()
    cfg.type = "Embed_Decoder_CTC"
    m = get_model_class("Embed_Decoder_CTC").create_model(cfg)
    batch = p2c_batch()
    out = m.loss(m.params, batch, {"dropout": jax.random.PRNGKey(0)}, train=True)
    assert np.isfinite(float(out["ctc_loss"]))
    ids, lens = m.greedy_decode(m.params, batch["phones"], batch["phone_lengths"])
    assert ids.shape[0] == 3


def test_p2c_ctc_cv_epoch_logs_dev_wer(tmp_path):
    """A cross-valid epoch of the CTC phone2char solver must compute and log
    dev WER (reference: src/solvers/phone2char.py:232-238)."""
    import json

    from openasr_tpu.parallel import make_mesh
    from openasr_tpu.solvers import get_solver_class

    cfg = p2c_configs()
    cfg.type = "Embed_Decoder_CTC"
    m = get_model_class("Embed_Decoder_CTC").create_model(cfg)
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / "exp"),
        "print_inteval": 1, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 32},
    })
    solver = get_solver_class("Embed_Decoder_CTC")(
        m, training, [p2c_batch()], [p2c_batch()],
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    loss = solver.iter_one_epoch(cross_valid=True)
    assert np.isfinite(loss)
    metrics = [
        json.loads(line)
        for line in open(tmp_path / "exp" / "metrics.jsonl")
    ]
    wers = [r["dev_wer"] for r in metrics if "dev_wer" in r]
    assert len(wers) == 1 and np.isfinite(wers[0]) and wers[0] >= 0.0


# --------------------------------------------------------------------- GAN

def test_gan_losses_and_grads():
    cfg = Config({
        "type": "gan_phone2char",
        "G": {
            "encoder": {"vocab_size": 15, "d_model": 32},
            "decoder": {"vocab_size": 20, "d_model": 32, "nhead": 2,
                        "num_layers": 1, "dim_feedforward": 64,
                        "activation": "relu", "dropout_rate": 0.0},
        },
        "D": {"encoder": {"d_input": 20, "d_model": 32, "layer_num": 2}},
    })
    m = get_model_class("gan_phone2char").create_model(cfg)
    assert "G" in m.params and "D" in m.params

    batch = p2c_batch()
    batch["unpaired_phones"] = batch["phones"].copy()
    batch["unpaired_phone_lengths"] = batch["phone_lengths"].copy()
    batch["unpaired_text"] = np.random.RandomState(1).randint(
        3, 19, (3, 16)
    ).astype(np.int32)
    batch["unpaired_text_lengths"] = np.array([16, 12, 10], np.int32)

    rngs = {"dropout": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}
    losses = m.loss(m.params, batch, rngs, train=True)
    for k in ("ctc_loss", "g_loss", "d_loss"):
        assert k in losses and np.isfinite(float(losses[k])), k

    # combined grads: G step must not move D (via g_loss), D step must not
    # move G; the summed loss gives grads for both
    def total(p):
        ls = m.loss(p, batch, rngs, train=True)
        return (ls["ctc_loss"] / ls["n_tokens"] + ls["g_loss"] + ls["d_loss"])

    grads = jax.grad(total)(m.params)
    g_norm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads["G"]))
    d_norm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads["D"]))
    assert g_norm > 0 and d_norm > 0

    # restore_G warm start from a trained Embed_Decoder_CTC package
    g_cfg = Config(dict(cfg.G, type="Embed_Decoder_CTC"))
    g_model = get_model_class("Embed_Decoder_CTC").create_model(
        g_cfg, rng=jax.random.PRNGKey(5)
    )
    m.restore_G(g_model.package())
    np.testing.assert_array_equal(
        np.asarray(m.params["G"]["emb"]["embedding"]),
        np.asarray(g_model.params["emb"]["embedding"]),
    )


# ---------------------------------------------------------------------- LM

def lm_batch():
    rng = np.random.RandomState(0)
    return {
        "ids": rng.randint(3, 19, (4, 9)).astype(np.int32),
        "labels": rng.randint(3, 19, (4, 9)).astype(np.int32),
        "paddings": np.zeros((4, 9), np.float32),
    }


@pytest.mark.parametrize("mtype", ["lstm_lm", "transformer_lm"])
def test_lms(mtype):
    cfg = Config({"type": mtype, "vocab_size": 20, "d_model": 32,
                  "n_layers": 1, "nhead": 2, "num_layers": 1,
                  "dim_feedforward": 64, "dropout_rate": 0.0})
    m = get_model_class(mtype).create_model(cfg)
    batch = lm_batch()
    out = m.loss(m.params, batch, {"dropout": jax.random.PRNGKey(0)}, train=True)
    assert np.isfinite(float(out["ce_loss"]))
    ppl = m.perplexity(m.params, batch)
    assert 1.0 < ppl < 1e6


def test_lstm_lm_step_matches_full():
    cfg = Config({"type": "lstm_lm", "vocab_size": 20, "d_model": 32,
                  "n_layers": 2, "dropout_rate": 0.0})
    m = get_model_class("lstm_lm").create_model(cfg)
    ids = np.array([[1, 5, 7, 3]], np.int32)
    full = m.module.apply({"params": m.params}, jnp.asarray(ids))
    full_logp = np.asarray(jax.nn.log_softmax(full, -1))

    from openasr_tpu.models.lm import LSTMLM

    carries = m.module.apply(
        {"params": m.params}, 1, method=LSTMLM.init_carries
    )
    for t in range(4):
        logp, carries = m.module.apply(
            {"params": m.params}, jnp.asarray(ids[:, t]), carries,
            method=LSTMLM.step,
        )
        np.testing.assert_allclose(
            np.asarray(logp), full_logp[:, t], rtol=1e-4, atol=1e-5
        )


def test_gru_ctc_greedy_decode():
    """gru_ctc is listed as a CTC model by bin/infer.py — it must expose
    get_logits/greedy_decode (threading BatchNorm running stats) or every
    GRU-CTC decode crashes after the model load."""
    cfg = Config({
        "type": "gru_ctc",
        "signal": {"d_model": 16},
        "encoder": {"d_input": 16, "d_model": 16, "n_layers": 1,
                    "dropout": 0.0},
        "decoder": {"vocab_size": 10},
    })
    m = get_model_class("gru_ctc").create_model(cfg)
    rng = np.random.RandomState(0)
    n = 160 * 10
    waves = rng.randn(2, n).astype(np.float32)
    lens = np.array([n, n - 320], np.int32)
    logits, len_logits = m.get_logits(m.params, waves, lens)
    assert logits.shape[-1] == 10 and len(len_logits) == 2
    ids, out_lens = m.greedy_decode(m.params, waves, lens)
    assert ids.shape[0] == 2 and np.all(np.asarray(out_lens) >= 0)
