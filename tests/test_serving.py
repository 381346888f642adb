"""AOT decode export/serve roundtrip (openasr_tpu/serving.py)."""

import numpy as np

import jax

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.serving import ExportedDecoder, export_beam_decode


def small_model():
    cfg = Config({
        "type": "conv-transformer",
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 20,
                    "d_model": 32, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 32, "dim_feedforward": 64,
                    "activation": "relu", "dropout_rate": 0.0},
    })
    return get_model_class(cfg.type).create_model(cfg)


def test_export_and_serve_roundtrip(tmp_path):
    model = small_model()
    path = str(tmp_path / "decode.aot")
    export_beam_decode(
        model, buckets=[(2, 32), (4, 64)], path=path, beam_size=2,
        max_decode_len=6, platforms=("cpu",),
    )

    dec = ExportedDecoder(path)
    assert dec.meta["beam_size"] == 2
    assert dec.buckets == [(2, 32), (4, 64)]

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 32, 20).astype(np.float32)
    lens = np.array([32, 25], np.int32)

    # exact-bucket call matches the live jitted decode
    ref_preds, ref_lens, ref_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6
    )
    preds, out_lens, scores = dec(model.params, feats, lens)
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(ref_preds))
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=1e-5
    )

    # smaller batch/length: padded into the (4, 64) bucket, rows trimmed
    feats_s = rng.randn(3, 40, 20).astype(np.float32)
    lens_s = np.array([40, 33, 20], np.int32)
    preds_s, lens_out, _ = dec(model.params, feats_s, lens_s)
    assert preds_s.shape[0] == 3
    ref_s = model.batch_beam_decode(
        model.params,
        np.pad(feats_s, ((0, 1), (0, 24), (0, 0))),
        np.array([40, 33, 20, 1], np.int32),
        beam_size=2, max_decode_len=6,
    )[0][:3]
    np.testing.assert_array_equal(preds_s, np.asarray(ref_s))

    # no bucket fits -> loud error
    import pytest

    with pytest.raises(ValueError):
        dec(model.params, rng.randn(8, 32, 20).astype(np.float32),
            np.full((8,), 32, np.int32))


def test_export_bf16_compute(tmp_path):
    """A bfloat16-compute export reproduces the live bf16 model's decode
    and records the compute dtype in the artifact meta."""
    import jax.numpy as jnp

    from openasr_tpu.config import Config as _C

    f32_model = small_model()
    cfg = _C(dict(f32_model.configs))
    bf16_model = get_model_class(cfg.type).create_model(
        cfg, dtype=jnp.bfloat16
    )
    bf16_model.params = f32_model.params  # same weights, bf16 compute

    path = str(tmp_path / "decode_bf16.aot")
    export_beam_decode(
        bf16_model, buckets=[(2, 32)], path=path, beam_size=2,
        max_decode_len=6, platforms=("cpu",), compute="bfloat16",
    )
    dec = ExportedDecoder(path)
    assert dec.meta["compute"] == "bfloat16"

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 32, 20).astype(np.float32)
    lens = np.array([32, 25], np.int32)
    ref_preds, _, ref_scores = bf16_model.batch_beam_decode(
        bf16_model.params, feats, lens, beam_size=2, max_decode_len=6
    )
    preds, _, scores = dec(bf16_model.params, feats, lens)
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(ref_preds))
    # bf16 matmul rounding differs across backends (the live decode may run
    # on TPU, the exported CPU program on host), so scores agree only to
    # bf16 precision; the hypotheses themselves must be identical
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=2e-2
    )


def test_export_ctc_kind(tmp_path):
    """CTC models export greedy ids + log-probs (kind 'ctc') since their
    decode has no on-device beam."""
    cfg = Config({
        "type": "conv-ctc",
        "add_blk": True,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "decoder": {"vocab_size": 12},
    })
    model = get_model_class("conv-ctc").create_model(cfg)
    path = str(tmp_path / "ctc.aot")
    export_beam_decode(model, buckets=[(2, 32)], path=path,
                       platforms=("cpu",))
    dec = ExportedDecoder(path)
    assert dec.meta["kind"] == "ctc"
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 32, 20).astype(np.float32)
    lens = np.array([32, 20], np.int32)
    ids, id_lens, log_probs, len_logits = dec(model.params, feats, lens)
    ref_ids, ref_lens = model.greedy_decode(model.params, feats, lens)
    np.testing.assert_array_equal(ids, np.asarray(ref_ids))
    np.testing.assert_array_equal(id_lens, np.asarray(ref_lens))
    assert log_probs.shape[-1] == 12
    # log-probs normalized
    np.testing.assert_allclose(
        np.exp(log_probs).sum(-1), 1.0, rtol=1e-4
    )
