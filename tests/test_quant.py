"""Weight-only int8 quantization (openasr_tpu/quant.py) and the int8
serving export (serving.export_beam_decode(weights="int8"))."""

import numpy as np

import jax

from openasr_tpu import quant
from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.serving import ExportedDecoder, export_beam_decode


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    params = {
        "enc": {
            # mixed magnitudes per channel: per-channel scales must adapt
            "w": (rng.randn(64, 128) * np.logspace(-3, 1, 128)).astype(
                np.float32
            ),
            "b": rng.randn(128).astype(np.float32),  # 1D: passes through
        },
        "small": rng.randn(4, 4).astype(np.float32),  # tiny: untouched
        "ids": np.arange(10, dtype=np.int32),  # int: untouched
    }
    q = quant.quantize_params(params)
    assert quant.is_quantized_leaf(q["enc"]["w"])
    assert q["enc"]["w"][quant.Q_KEY].dtype == np.int8
    assert not quant.is_quantized_leaf(q["enc"]["b"])
    assert not quant.is_quantized_leaf(q["small"])
    assert q["ids"].dtype == np.int32

    # rounding bound: |W - dequant(Q)| <= scale / 2 per channel
    assert quant.quantization_error(params, q) <= 0.5 + 1e-6

    deq = quant.dequantize_params(q)
    w, dw = params["enc"]["w"], np.asarray(deq["enc"]["w"])
    assert dw.dtype == np.float32
    # per-channel relative error stays at int8 resolution even though
    # channel magnitudes span 4 orders of magnitude
    amax = np.abs(w).max(axis=0)
    assert float(np.max(np.abs(w - dw) / amax)) <= (1.0 / 254 + 1e-6)
    np.testing.assert_array_equal(np.asarray(deq["enc"]["b"]), params["enc"]["b"])


def test_zero_channel_and_negative_extreme():
    params = {"w": np.zeros((64, 64), np.float32)}
    params["w"][:, 1] = -3.0  # symmetric: -amax must hit -127 exactly
    q = quant.quantize_params(params)
    deq = np.asarray(quant.dequantize_params(q)["w"])
    np.testing.assert_allclose(deq, params["w"], atol=1e-7)


def _export_model():
    cfg = Config({
        "type": "conv-transformer",
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 64, "nhead": 2,
                    "dim_feedforward": 128, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 20,
                    "d_model": 64, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 64, "dim_feedforward": 128,
                    "activation": "relu", "dropout_rate": 0.0},
    })
    return get_model_class(cfg.type).create_model(cfg)


def test_int8_export_decodes_like_float(tmp_path):
    model = _export_model()
    # sanity: this model is big enough that something actually quantizes
    qp = quant.quantize_params(model.params)
    n_q = sum(
        quant.is_quantized_leaf(l)
        for l in jax.tree_util.tree_leaves(qp, is_leaf=quant.is_quantized_leaf)
    )
    assert n_q >= 4

    path = str(tmp_path / "decode_int8.aot")
    export_beam_decode(
        model, buckets=[(2, 32)], path=path, beam_size=2,
        max_decode_len=6, platforms=("cpu",), weights="int8",
    )
    dec = ExportedDecoder(path)
    assert dec.meta["weights"] == "int8"

    rng = np.random.RandomState(1)
    feats = rng.randn(2, 32, 20).astype(np.float32)
    lens = np.array([32, 25], np.int32)

    ref_preds, _, ref_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6
    )
    served = dec.prepare_params(model.params)
    preds, _, scores = dec(served, feats, lens)
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(ref_preds))
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=0.05, atol=0.05
    )

    # the artifact's parameter payload really is ~4x smaller
    f32_bytes = sum(
        np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(model.params)
    )
    q_bytes = sum(
        np.asarray(l).nbytes
        for l in jax.tree_util.tree_leaves(served)
    )
    assert q_bytes < 0.5 * f32_bytes

    # float artifacts are unaffected: prepare_params is the identity
    path_f = str(tmp_path / "decode_f32.aot")
    export_beam_decode(
        model, buckets=[(2, 32)], path=path_f, beam_size=2,
        max_decode_len=6, platforms=("cpu",),
    )
    dec_f = ExportedDecoder(path_f)
    assert dec_f.meta["weights"] == "float32"
    assert dec_f.prepare_params(model.params) is model.params
