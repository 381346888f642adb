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


def _small_lm(kind, vocab):
    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class

    if kind == "lstm_lm":
        cfg = {"vocab_size": vocab, "d_model": 16, "n_layers": 1,
               "dropout_rate": 0.0}
    else:
        cfg = {"vocab_size": vocab, "d_model": 16, "nhead": 2,
               "num_layers": 1, "dim_feedforward": 32,
               "dropout_rate": 0.0}
    return get_model_class(kind).create_model(Config(cfg))


def test_export_attention_beam_with_lm_fusion(tmp_path):
    """kind 'beam' + LM: the artifact's fused n-best equals the live
    fused beam; LM weights ride as a program INPUT (round-4 directive
    #2 — AOT serving keeps the accuracy features the live path has)."""
    import pytest

    model = small_model()
    lm = _small_lm("lstm_lm", 20)  # attention fusion: LM vocab == model vocab
    path = str(tmp_path / "beam_lm.aot")
    export_beam_decode(
        model, buckets=[(2, 32)], path=path, beam_size=2,
        max_decode_len=6, platforms=("cpu",), lm=lm, lm_weight=0.4,
    )
    dec = ExportedDecoder(path)
    assert dec.meta["lm"] == {"model_type": "lstm_lm", "lm_weight": 0.4}

    rng = np.random.RandomState(7)
    feats = rng.randn(2, 32, 20).astype(np.float32)
    lens = np.array([32, 25], np.int32)
    ref = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6,
        lm=lm, lm_params=lm.params, lm_weight=0.4,
    )
    out = dec(model.params, feats, lens, lm_params=lm.params)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(
        np.asarray(out[2]), np.asarray(ref[2]), rtol=1e-5, atol=1e-5
    )
    # fusion actually changes the artifact's scores vs an unfused export
    unfused = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6
    )
    assert not np.allclose(np.asarray(out[2]), np.asarray(unfused[2]))

    # loud calling-convention guards both ways
    with pytest.raises(ValueError, match="lm_params"):
        dec(model.params, feats, lens)
    nolm_path = str(tmp_path / "beam_nolm.aot")
    export_beam_decode(model, buckets=[(2, 32)], path=nolm_path,
                       beam_size=2, max_decode_len=6, platforms=("cpu",))
    with pytest.raises(ValueError, match="WITHOUT"):
        ExportedDecoder(nolm_path)(model.params, feats, lens,
                                   lm_params=lm.params)


def test_export_ctc_device_beam_with_lm_and_cutoffs(tmp_path):
    """kind 'ctc_beam' + transformer LM + custom cutoffs: the artifact
    reproduces the live fused beam and meta records the cutoffs
    (round-4 ADVICE: cutoffs were baked-but-unrecorded)."""
    import jax.numpy as jnp

    from openasr_tpu.models.lm import make_lm_step_spec
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
    lm = _small_lm("transformer_lm", 11)
    path = str(tmp_path / "ctc_beam_lm.aot")
    _export(model, buckets=[(2, 32)], path=path, beam_size=3,
            platforms=("cpu",), ctc_device_beam=True,
            cutoff_top_n=6, cutoff_logp=-9.0, lm=lm, lm_weight=0.5)
    dec = ExportedDecoder(path)
    assert dec.meta["cutoff_top_n"] == 6
    assert dec.meta["cutoff_logp"] == -9.0
    assert dec.meta["lm"]["model_type"] == "transformer_lm"

    rng = np.random.RandomState(8)
    feats = rng.randn(2, 32, 20).astype(np.float32)
    lens = np.array([32, 24], np.int32)
    toks, tlens, scores = dec(model.params, feats, lens,
                              lm_params=lm.params)

    logits, len_logits = model.get_logits(model.params, feats, lens)
    lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    spec = make_lm_step_spec(lm)
    init_cache = spec["init_cache_fn"](2 * 3, int(lp.shape[1]) + 1)
    ref_t, ref_l, ref_s = ctc_prefix_beam_device(
        lp, len_logits, blank=11, beam=3, cutoff_top_n=6,
        cutoff_logp=-9.0, lm_step_fn=spec["step_fn"],
        init_lm_cache=init_cache, lm_weight=0.5, lm_params=lm.params,
    )
    np.testing.assert_array_equal(toks, np.asarray(ref_t))
    np.testing.assert_array_equal(tlens, np.asarray(ref_l))
    np.testing.assert_allclose(scores, np.asarray(ref_s), rtol=1e-5,
                               atol=1e-5)


def test_export_ctc_kind_refuses_lm(tmp_path):
    """kind 'ctc' (greedy + log-probs) has no fusion hook — exporting
    it with an LM must fail loudly, not silently drop fusion."""
    import pytest

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
    with pytest.raises(ValueError, match="ctc_device_beam"):
        export_beam_decode(
            model, buckets=[(2, 32)], path=str(tmp_path / "x.aot"),
            platforms=("cpu",), lm=_small_lm("lstm_lm", 11),
            lm_weight=0.5,
        )


def test_export_stream_beam_roundtrip(tmp_path):
    """The streaming prefix-beam tick exports (ExportedStreamBeam) with
    LM fusion AND biasing: driving the artifact chunk by chunk equals
    the live one-shot fused+biased device beam, and the loader replays
    the loud capacity guard."""
    import pytest

    from openasr_tpu.models.lm import make_lm_step_spec
    from openasr_tpu.ops.ctc_beam_device import (
        build_context_tables,
        ctc_prefix_beam_device,
    )
    from openasr_tpu.serving import ExportedStreamBeam, export_stream_beam

    b, chunk, v, beam, t = 2, 6, 10, 4, 18
    blank, w_lm, w_ctx = v - 1, 0.5, 1.0
    lm = _small_lm("lstm_lm", v - 1)
    phrases = np.asarray([[1, 2, 1, -1]], np.int32)
    path = str(tmp_path / "stream_beam.aot")
    export_stream_beam(
        path, batch=b, beam=beam, chunk=chunk, max_frames=t,
        vocab_size=v, blank=blank, platforms=("cpu",),
        lm=lm, lm_weight=w_lm, context_phrases=phrases,
        context_weight=w_ctx,
    )
    sb = ExportedStreamBeam(path)
    assert sb.meta["lm"]["model_type"] == "lstm_lm"
    assert sb.meta["context_num_phrases"] == 1

    rng = np.random.RandomState(9)
    logits = rng.randn(b, t, v).astype(np.float32) * 2.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = np.asarray([t, t - 4], np.int32)

    state = sb.init_state(lm_params=lm.params)
    out = None
    for start in range(0, t, chunk):
        sl = lp[:, start : start + chunk]
        valid = (
            np.arange(start, start + chunk)[None, :] < lengths[:, None]
        )
        state, out = sb.step(state, sl, valid, lm_params=lm.params)
    toks, lens, scores = map(np.asarray, out)

    spec = make_lm_step_spec(lm)
    init_cache = spec["init_cache_fn"](b * beam, t + 1)
    ref_t, ref_l, ref_s = ctc_prefix_beam_device(
        lp, lengths, blank=blank, beam=beam,
        lm_step_fn=spec["step_fn"], init_lm_cache=init_cache,
        lm_weight=w_lm, lm_params=spec["params"],
        context_phrases=phrases, context_weight=w_ctx,
    )
    ref_t, ref_l, ref_s = map(np.asarray, (ref_t, ref_l, ref_s))
    np.testing.assert_array_equal(lens, ref_l)
    np.testing.assert_allclose(scores, ref_s, atol=1e-5)
    for i in range(b):
        for n in range(beam):
            np.testing.assert_array_equal(
                toks[i, n, : lens[i, n]], ref_t[i, n, : lens[i, n]]
            )

    # capacity guard survives the export boundary
    with pytest.raises(ValueError, match="token buffer"):
        sb.step(state, lp[:, :chunk], np.ones((b, chunk), bool),
                lm_params=lm.params)


def test_export_decode_cli_stream_beam(tmp_path):
    """tools/export_decode.py --stream_beam exports the streaming
    prefix-beam tick with LM fusion + biasing through the real CLI, and
    the artifact drives end to end."""
    import os
    import sys

    import numpy as np

    from openasr_tpu.models import get_model_class
    from openasr_tpu.serving import ExportedStreamBeam
    from openasr_tpu.utils.checkpoint import save_package

    from test_streaming import _speech_cfg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import export_decode as export_decode_cli

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 2}, online=False)
    model = get_model_class(cfg.type).create_model(cfg)
    pkg_path = str(tmp_path / "last.pkg")
    save_package({"model": model.package()}, pkg_path)
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("a\nb\nc\nd\n")
    hot = tmp_path / "hot.txt"
    hot.write_text("a b\n")
    lm = _small_lm("lstm_lm", 7)
    lm_path = str(tmp_path / "lm.pkg")
    save_package({"model": lm.package()}, lm_path)

    out = str(tmp_path / "stream_beam.aot")
    export_decode_cli.main([
        "--model_type", cfg.type, "--model_pkg", pkg_path,
        "--vocab_path", str(vocab_path), "--out", out, "--add_blk",
        "--platforms", "cpu", "--stream_beam", "3",
        "--stream_beam_batch", "2", "--max_frames", "32",
        "--lm_pkg", lm_path, "--lm_weight", "0.4",
        "--context_file", str(hot), "--context_weight", "1.5",
    ])
    sb = ExportedStreamBeam(out)
    v = sb.meta["vocab_size"]
    assert sb.meta["chunk"] == 4 and sb.meta["beam"] == 3
    assert sb.meta["lm"]["lm_weight"] == 0.4
    assert sb.meta["context_num_phrases"] == 1

    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, v).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    state = sb.init_state(lm_params=lm.params)
    state, (toks, lens, scores) = sb.step(
        state, lp, np.ones((2, 4), bool), lm_params=lm.params
    )
    assert np.asarray(toks).shape == (2, 3, 32)
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-6)
