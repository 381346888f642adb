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


def test_export_streaming_step_roundtrip(tmp_path):
    """export_streaming_step: the AOT tick reproduces the live
    StreamingRecognizer exactly, chunk by chunk, from a rebuilt zero
    state — no model code on the serving side."""
    import jax
    import numpy as np

    from openasr_tpu.models import get_model_class
    from openasr_tpu.serving import ExportedStreamer, export_streaming_step
    from openasr_tpu.streaming import StreamingRecognizer

    from test_streaming import _speech_cfg

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 2}, online=False)
    model = get_model_class(cfg.type).create_model(cfg)
    path = str(tmp_path / "stream.zip")
    export_streaming_step(model, batch_sizes=[2], path=path,
                          platforms=("cpu",))

    streamer = ExportedStreamer(path)
    rec = StreamingRecognizer(model)

    state_live = rec.init_state(2)
    state_aot = streamer.init_state(2)

    rng = np.random.RandomState(0)
    for tick in range(3):
        chunk = rng.randn(2, 16, 20).astype(np.float32)  # [B, 4*chunk, D]
        lens = np.asarray([16, 12 if tick == 2 else 16], np.int32)
        state_live, out_live = rec.step(state_live, chunk, lens)
        state_aot, out_aot = streamer.step(model.params, state_aot, chunk,
                                           lens)
        np.testing.assert_allclose(
            np.asarray(out_aot["enc"]), np.asarray(out_live["enc"]),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(out_aot["valid"]), np.asarray(out_live["valid"])
        )
        if out_live["logits"] is not None:
            np.testing.assert_allclose(
                np.asarray(out_aot["logits"]),
                np.asarray(out_live["logits"]), atol=1e-5,
            )
        for (pa, la), (pl, ll) in zip(
            jax.tree_util.tree_flatten_with_path(state_aot)[0],
            jax.tree_util.tree_flatten_with_path(state_live)[0],
        ):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pl)
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(ll), atol=1e-5,
                err_msg=jax.tree_util.keystr(pa),
            )


def test_exported_streamer_rejects_wrong_artifacts_and_shapes(tmp_path):
    import numpy as np
    import pytest

    from openasr_tpu.models import get_model_class
    from openasr_tpu.serving import ExportedStreamer, export_streaming_step

    from test_streaming import _speech_cfg

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 2}, online=False)
    model = get_model_class(cfg.type).create_model(cfg)
    path = str(tmp_path / "stream.zip")
    export_streaming_step(model, batch_sizes=[2], path=path,
                          platforms=("cpu",), max_frames=8)

    s = ExportedStreamer(path)
    with pytest.raises(ValueError, match="batch_size"):
        s.init_state(3)
    state = s.init_state(2)
    with pytest.raises(ValueError, match="chunk shape"):
        s.step(model.params, state, np.zeros((2, 7, 20), np.float32))
    # PE capacity: max_frames=8 allows 2 chunks of 4; the 3rd must raise
    chunk = np.zeros((2, 16, 20), np.float32)
    for _ in range(2):
        state, _out = s.step(model.params, state, chunk)
    with pytest.raises(ValueError, match="capacity"):
        s.step(model.params, state, chunk)


def test_export_decode_cli_streaming(tmp_path):
    """tools/export_decode.py --streaming produces an ExportedStreamer
    artifact from a packaged checkpoint (the CLI path a deployment
    would run)."""
    import os
    import sys

    import numpy as np

    from openasr_tpu.models import get_model_class
    from openasr_tpu.serving import ExportedStreamer
    from openasr_tpu.utils.checkpoint import save_package

    from test_streaming import _speech_cfg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import export_decode as export_decode_cli

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 2}, online=False)
    model = get_model_class(cfg.type).create_model(cfg)
    pkg_path = str(tmp_path / "last.pkg")
    save_package({"model": model.package()}, pkg_path)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("a\nb\nc\nd\n")

    out = str(tmp_path / "stream.aot")
    export_decode_cli.main([
        "--model_type", cfg.type, "--model_pkg", pkg_path,
        "--vocab_path", str(vocab), "--out", out, "--add_blk",
        "--platforms", "cpu", "--streaming", "--stream_batches", "2",
    ])
    s = ExportedStreamer(out)
    state = s.init_state(2)
    chunk = np.random.RandomState(0).randn(2, 16, 20).astype(np.float32)
    state, tick = s.step(model.params, state, chunk)
    assert np.asarray(tick["enc"]).shape[0] == 2


def test_exported_streamer_step_rejects_unknown_bucket(tmp_path):
    """step() on a batch size with no exported program gives the same
    actionable error as init_state, not a bare KeyError."""
    import numpy as np
    import pytest

    from openasr_tpu.models import get_model_class
    from openasr_tpu.serving import ExportedStreamer, export_streaming_step

    from test_streaming import _speech_cfg

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 2}, online=False)
    model = get_model_class(cfg.type).create_model(cfg)
    path = str(tmp_path / "stream.zip")
    export_streaming_step(model, batch_sizes=[2], path=path,
                          platforms=("cpu",))
    s = ExportedStreamer(path)
    state = s.init_state(2)
    chunk4 = np.zeros((4, 16, 20), np.float32)
    with pytest.raises(ValueError, match="batch_size"):
        s.step(model.params, state, chunk4)


def test_export_ctc_device_beam_kind(tmp_path):
    """ctc_device_beam=True exports the on-device prefix beam (kind
    'ctc_beam'): the artifact's n-best equals the live
    ctc_prefix_beam_device over the model's own log-probs."""
    import jax.numpy as jnp

    from openasr_tpu.ops.ctc_beam_device import ctc_prefix_beam_device
    from openasr_tpu.serving import export_beam_decode as _export

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
    path = str(tmp_path / "ctc_beam.aot")
    _export(model, buckets=[(2, 32)], path=path, beam_size=3,
            platforms=("cpu",), ctc_device_beam=True)
    dec = ExportedDecoder(path)
    assert dec.meta["kind"] == "ctc_beam"

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 32, 20).astype(np.float32)
    lens = np.array([32, 20], np.int32)
    toks, tlens, scores = dec(model.params, feats, lens)

    logits, len_logits = model.get_logits(model.params, feats, lens)
    lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    ref_t, ref_l, ref_s = ctc_prefix_beam_device(
        lp, len_logits, blank=11, beam=3
    )
    np.testing.assert_array_equal(toks, np.asarray(ref_t))
    np.testing.assert_array_equal(tlens, np.asarray(ref_l))
    np.testing.assert_allclose(scores, np.asarray(ref_s), rtol=1e-5)


def test_export_streaming_step_roundtrip_online(tmp_path):
    """The ONLINE (wave -> fbank) streaming tick exports too: the state
    carries the wave/feature caches and the AOT program reproduces the
    live executor on raw audio chunks."""
    import numpy as np

    from openasr_tpu.models import get_model_class
    from openasr_tpu.serving import ExportedStreamer, export_streaming_step
    from openasr_tpu.streaming import StreamingRecognizer

    from test_streaming import _speech_cfg

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 2}, online=True)
    model = get_model_class(cfg.type).create_model(cfg)
    path = str(tmp_path / "stream_online.zip")
    export_streaming_step(model, batch_sizes=[2], path=path,
                          platforms=("cpu",))

    streamer = ExportedStreamer(path)
    rec = StreamingRecognizer(model)
    assert not streamer.meta["offline"]
    n = streamer.meta["chunk_input"][0]  # chunk_samples

    state_live = rec.init_state(2)
    state_aot = streamer.init_state(2)
    rng = np.random.RandomState(2)
    for _ in range(2):
        chunk = (rng.randn(2, n) * 0.1).astype(np.float32)
        state_live, out_live = rec.step(state_live, chunk)
        state_aot, out_aot = streamer.step(model.params, state_aot, chunk)
        np.testing.assert_allclose(
            np.asarray(out_aot["enc"]), np.asarray(out_live["enc"]),
            atol=2e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(out_aot["valid"]), np.asarray(out_live["valid"])
        )


def test_export_ctc_device_beam_with_biasing(tmp_path):
    """The hotword table bakes into the exported ctc_beam program: the
    artifact reproduces the live biased search, and its meta records the
    biasing config."""
    import jax.numpy as jnp

    from openasr_tpu.ops.ctc_beam_device import ctc_prefix_beam_device
    from openasr_tpu.serving import export_beam_decode as _export

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
    phrases = np.asarray([[3, 4, -1], [6, 7, 8]], np.int32)
    path = str(tmp_path / "ctc_beam_ctx.aot")
    _export(model, buckets=[(2, 32)], path=path, beam_size=3,
            platforms=("cpu",), ctc_device_beam=True,
            context_phrases=phrases, context_weight=2.0)
    dec = ExportedDecoder(path)
    assert dec.meta["kind"] == "ctc_beam"
    assert dec.meta["context_weight"] == 2.0
    assert dec.meta["context_num_phrases"] == 2

    rng = np.random.RandomState(3)
    feats = rng.randn(2, 32, 20).astype(np.float32)
    lens = np.array([32, 24], np.int32)
    toks, tlens, scores = dec(model.params, feats, lens)

    logits, len_logits = model.get_logits(model.params, feats, lens)
    lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    ref_t, ref_l, ref_s = ctc_prefix_beam_device(
        lp, len_logits, blank=11, beam=3,
        context_phrases=phrases, context_weight=2.0,
    )
    np.testing.assert_array_equal(toks, np.asarray(ref_t))
    np.testing.assert_allclose(scores, np.asarray(ref_s), rtol=1e-5)
