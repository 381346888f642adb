"""LM shallow fusion in beam search."""

import numpy as np

import jax

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class


def test_shallow_fusion_changes_scores_and_matches_weight_zero():
    cfg = Config({
        "type": "conv-transformer",
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer", "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 20,
                    "d_model": 32, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 32, "dim_feedforward": 64,
                    "activation": "relu", "dropout_rate": 0.0},
    })
    model = get_model_class(cfg.type).create_model(cfg)
    lm_cfg = Config({"type": "lstm_lm", "vocab_size": 20, "d_model": 16,
                     "n_layers": 1, "dropout_rate": 0.0})
    lm = get_model_class("lstm_lm").create_model(lm_cfg)

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 48, 20).astype(np.float32)
    lens = np.array([48, 40], np.int32)

    base_preds, base_lens, base_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=3, max_decode_len=6,
    )
    zero_preds, _, zero_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=3, max_decode_len=6,
        lm=lm, lm_weight=0.0,
    )
    np.testing.assert_array_equal(np.asarray(base_preds), np.asarray(zero_preds))
    np.testing.assert_allclose(
        np.asarray(base_scores), np.asarray(zero_scores), rtol=1e-5
    )

    fused_preds, _, fused_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=3, max_decode_len=6,
        lm=lm, lm_weight=0.5,
    )
    assert not np.allclose(np.asarray(fused_scores), np.asarray(base_scores))

    # fused decode also works under jit
    decode = jax.jit(
        lambda p, lp, x, l: model.batch_beam_decode(
            p, x, l, beam_size=3, max_decode_len=6,
            lm=lm, lm_params=lp, lm_weight=0.5,
        )
    )
    j_preds, _, j_scores = decode(model.params, lm.params, feats, lens)
    np.testing.assert_array_equal(np.asarray(j_preds), np.asarray(fused_preds))


def test_cif_beam_decode_accepts_lm():
    """CIF-family batch_beam_decode must take the same lm kwargs the infer
    CLI always passes (a missing signature here made CLI decode of CIF
    models crash with TypeError)."""
    cfg = Config({
        "type": "CIF",
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "assigner": {"d_model": 32, "n_layers": 2, "w_context": 3,
                     "dropout": 0.0},
        "decoder": {"type": "CIF_Decoder", "vocab_size": 20, "d_model": 32,
                    "nhead": 2, "num_layers": 1, "encoder_dim": 32,
                    "dim_feedforward": 64, "activation": "relu",
                    "dropout_rate": 0.0},
    })
    model = get_model_class("CIF").create_model(cfg)
    lm = get_model_class("lstm_lm").create_model(Config(
        {"type": "lstm_lm", "vocab_size": 20, "d_model": 16,
         "n_layers": 1, "dropout_rate": 0.0}
    ))
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 48, 20).astype(np.float32)
    lens = np.array([48, 40], np.int32)

    base_preds, _, base_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6,
        lm=lm, lm_weight=0.0,
    )
    fused_preds, _, fused_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6,
        lm=lm, lm_params=lm.params, lm_weight=0.5,
    )
    assert np.asarray(fused_preds).shape == np.asarray(base_preds).shape
    assert not np.allclose(np.asarray(fused_scores), np.asarray(base_scores))
