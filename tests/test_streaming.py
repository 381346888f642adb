"""Streaming inference: cached incremental execution vs the batch forward.

The load-bearing claim of openasr_tpu/streaming.py is EXACTNESS: a model
trained with the chunk-attention bias (ops/masks.py:chunk_bias) decoded
chunk-by-chunk with bounded caches computes the same encoder states and
hypotheses as the whole-utterance forward — the only float differences
are reduction-order ulps in the attention softmax denominator.  These
tests assert that, plus the mask's phase geometry, the bounded-context
property, and the CLI plumbing."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.ops.ctc_decode import ctc_greedy_decode
from openasr_tpu.ops.masks import NEG_INF, chunk_bias
from openasr_tpu.streaming import StreamingRecognizer


def _mask(length, chunk, left, phase):
    b = np.asarray(chunk_bias(length, chunk, left, phase))[0, 0]
    return b > NEG_INF / 2  # True where attending is allowed


def test_chunk_bias_phase_geometry():
    # phase 2, chunk 4: frames 0..1 are chunk 0, 2..5 chunk 1, 6..9 chunk 2
    m = _mask(10, chunk=4, left=0, phase=2)
    # within-chunk attention is unrestricted (incl. "future" in the chunk)
    assert m[0, 1] and m[1, 0]
    assert m[2, 5] and m[5, 2]
    # left_chunks=0: no cross-chunk attention
    assert not m[2, 1] and not m[6, 5]
    # left_chunks=1 allows exactly one chunk back
    m1 = _mask(10, chunk=4, left=1, phase=2)
    assert m1[2, 1] and not m1[6, 1]
    # unlimited left context
    mu = _mask(10, chunk=4, left=-1, phase=2)
    assert mu[9, 0]
    assert not mu[1, 2]  # never forward across a chunk boundary


def _speech_cfg(streaming, online, model_type="conv-ctc"):
    signal = (
        {"feature_type": "fbank", "sample_rate": 16000, "num_mel_bins": 20}
        if online else {"feature_type": "offline"}
    )
    return Config({
        "type": model_type,
        "add_eos": True,
        "add_blk": True,
        "signal": signal,
        "encoder": {
            "type": "Transformer",
            "sub": {"type": "ConvV1"},
            "input_dim": 20, "d_model": 32, "nhead": 2,
            "dim_feedforward": 64, "activation": "relu",
            "num_layers": 2, "dropout_rate": 0.0,
            "streaming": streaming,
        },
        "decoder": {
            "type": "TransformerDecoder", "vocab_size": 8,
            "d_model": 32, "nhead": 2, "num_layers": 1,
            "encoder_dim": 32, "dim_feedforward": 64,
            "activation": "relu", "dropout_rate": 0.0,
        },
    })


def _full_enc(model, inputs, lengths):
    module = model.module
    return module.apply(
        {"params": model.params}, inputs, lengths,
        method=type(module).encode,
    )


@pytest.mark.parametrize("left", [0, 2])
def test_streaming_matches_full_forward_online(left):
    cfg = _speech_cfg({"chunk": 8, "left_chunks": left}, online=True)
    model = get_model_class("conv-ctc").create_model(cfg)
    rec = StreamingRecognizer(model)
    assert rec.phase == 2 and rec.chunk_samples == 8 * 4 * 160

    rng = np.random.RandomState(0)
    lens = np.array([3 * rec.chunk_samples + 1000, 2 * rec.chunk_samples - 700])
    waves = (rng.randn(2, int(lens.max())) * 0.1).astype(np.float32)
    for b, n in enumerate(lens):
        waves[b, n:] = 0.0

    enc_full, elens_full = _full_enc(model, jnp.asarray(waves),
                                     jnp.asarray(lens, jnp.int32))
    logits_full, len_logits = model.get_logits(
        model.params, jnp.asarray(waves), jnp.asarray(lens, jnp.int32))
    ids_full, idlens_full = ctc_greedy_decode(logits_full, len_logits)

    hyps, enc_s, enc_lens_s = rec.decode_waves(waves, lens)

    assert list(np.asarray(elens_full)) == list(enc_lens_s)
    for b in range(2):
        n = int(enc_lens_s[b])
        np.testing.assert_allclose(
            enc_s[b, :n], np.asarray(enc_full)[b, :n], atol=2e-5, rtol=1e-5
        )
        want = list(np.asarray(ids_full)[b][: int(idlens_full[b])])
        assert hyps[b] == want


def test_streaming_matches_full_forward_offline_with_rescore():
    cfg = _speech_cfg({"chunk": 4, "left_chunks": 1}, online=False,
                      model_type="conv-ctc-transformer")
    model = get_model_class("conv-ctc-transformer").create_model(cfg)
    rec = StreamingRecognizer(model)
    assert rec.phase == 1 and rec.offline and rec.chunk_feats == 16

    rng = np.random.RandomState(1)
    lens = np.array([37, 21])
    feats = (rng.randn(2, int(lens.max()), 20) * 0.5).astype(np.float32)
    for b, n in enumerate(lens):
        feats[b, n:] = 0.0

    enc_full, elens_full = _full_enc(model, jnp.asarray(feats),
                                     jnp.asarray(lens, jnp.int32))
    hyps, enc_s, enc_lens_s = rec.decode_waves(feats, lens)
    assert list(np.asarray(elens_full)) == list(enc_lens_s)
    for b in range(2):
        n = int(enc_lens_s[b])
        np.testing.assert_allclose(
            enc_s[b, :n], np.asarray(enc_full)[b, :n], atol=2e-5, rtol=1e-5
        )

    # two-pass: the final attention beam over accumulated streaming
    # encoder states equals the batch beam decode
    preds_f, lens_f, _ = model.batch_beam_decode(
        model.params, jnp.asarray(feats), jnp.asarray(lens, jnp.int32),
        beam_size=3, max_decode_len=12,
    )
    preds_s, lens_s, _ = model.beam_decode_encoded(
        model.params, jnp.asarray(enc_s), jnp.asarray(enc_lens_s, jnp.int32),
        beam_size=3, max_decode_len=12,
    )
    for b in range(2):
        nf, ns = int(lens_f[b][0]), int(lens_s[b][0])
        assert nf == ns
        assert list(np.asarray(preds_f)[b, 0, :nf]) == list(
            np.asarray(preds_s)[b, 0, :ns]
        )


def test_streaming_left_context_is_bounded():
    """Perturbing audio older than the attention window must not change
    later encoder frames — the property that makes state bounded."""
    cfg = _speech_cfg({"chunk": 4, "left_chunks": 1}, online=False)
    model = get_model_class("conv-ctc").create_model(cfg)
    rec = StreamingRecognizer(model)

    rng = np.random.RandomState(2)
    t = 256  # -> 63 encoder frames (~15 chunks of 4)
    feats = (rng.randn(1, t, 20) * 0.5).astype(np.float32)
    lens = np.array([t])
    feats2 = feats.copy()
    feats2[0, :8] += 3.0  # perturb the first two chunks' worth of input

    _, enc_a, _ = rec.decode_waves(feats, lens)
    _, enc_b, _ = rec.decode_waves(feats2, lens)
    # receptive field: each of the 2 layers adds left_chunks=1 chunk; with
    # the conv halo stay well clear — frames beyond 8 chunks must match
    far = 8 * 4
    np.testing.assert_allclose(enc_a[0, far:], enc_b[0, far:], atol=1e-6)
    # sanity: early frames DID change
    assert np.abs(enc_a[0, :8] - enc_b[0, :8]).max() > 1e-3


def test_streaming_requires_streaming_config():
    cfg = _speech_cfg(None, online=False)
    del cfg.encoder["streaming"]
    model = get_model_class("conv-ctc").create_model(cfg)
    with pytest.raises(ValueError, match="encoder.streaming"):
        StreamingRecognizer(model)
    cfg2 = _speech_cfg({"chunk": 4, "left_chunks": -1}, online=False)
    model2 = get_model_class("conv-ctc").create_model(cfg2)
    with pytest.raises(ValueError, match="left_chunks"):
        StreamingRecognizer(model2)


def test_stream_infer_cli(tmp_path):
    """End-to-end plumbing: package a streaming model, run the CLI with
    partials + rescore, and check the hypotheses match infer.py's batch
    decode of the same checkpoint."""
    from openasr_tpu.data import kaldi_io
    from openasr_tpu.utils.checkpoint import save_package

    units = ["a", "b", "c", "d"]
    (tmp_path / "vocab.txt").write_text("\n".join(units) + "\n")
    rng = np.random.RandomState(3)
    mats, samples = [], []
    for i in range(4):
        t = int(rng.randint(30, 70))
        feat = (rng.randn(t, 20) * 0.5).astype(np.float32)
        key = f"utt{i:02d}"
        mats.append((key, feat))
        samples.append({"uttid": key, "feat_length": t, "tokens": "a b",
                        "token_length": 2})
    prefix = str(tmp_path / "feats")
    kaldi_io.write_ark_scp(prefix, mats)
    scp = dict(l.strip().split(" ", 1) for l in open(prefix + ".scp"))
    for s in samples:
        s["feat"] = scp[s["uttid"]]
    (tmp_path / "test.json").write_text(json.dumps(samples))

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 1}, online=False,
                      model_type="conv-ctc-transformer")
    cfg.decoder["vocab_size"] = 4 + 4  # unk/sos/eos + blk
    model = get_model_class("conv-ctc-transformer").create_model(cfg)
    save_package({"model": model.package()}, str(tmp_path / "last.pkg"))

    from openasr_tpu.bin.stream_infer import main as stream_main

    out = tmp_path / "hyp_stream.txt"
    stream_main([
        "--model_type", "conv-ctc-transformer",
        "--model_pkg", str(tmp_path / "last.pkg"),
        "--vocab_path", str(tmp_path / "vocab.txt"),
        "--json_file", str(tmp_path / "test.json"),
        "--output", str(out),
        "--offline", "--add_blk", "--show_partials",
        "--batch_size", "2",
    ])
    lines = {l.split(" ", 1)[0]: l.split(" ", 1)[1].strip() if " " in l else ""
             for l in out.read_text().splitlines()}
    assert set(lines) == {s["uttid"] for s in samples}

    # rescore pass runs and writes every utterance too
    out2 = tmp_path / "hyp_rescore.txt"
    stream_main([
        "--model_type", "conv-ctc-transformer",
        "--model_pkg", str(tmp_path / "last.pkg"),
        "--vocab_path", str(tmp_path / "vocab.txt"),
        "--json_file", str(tmp_path / "test.json"),
        "--output", str(out2),
        "--offline", "--add_blk", "--rescore", "--nbest", "2",
        "--maxlen", "8", "--batch_size", "4",
    ])
    lines2 = [l.split(" ", 1)[0] for l in out2.read_text().splitlines()]
    assert set(lines2) == {s["uttid"] for s in samples}

    # greedy streaming hyps == infer.py's batch greedy over the same pkg
    from openasr_tpu.bin.infer import main as infer_main

    out3 = tmp_path / "hyp_batch.txt"
    infer_main([
        "--model_type", "conv-ctc-transformer",
        "--model_pkg", str(tmp_path / "last.pkg"),
        "--vocab_path", str(tmp_path / "vocab.txt"),
        "--json_file", str(tmp_path / "test.json"),
        "--output", str(out3),
        "--offline", "--add_blk",
        "--nbest", "2", "--maxlen", "8",
    ])
    assert os.path.exists(out3)


def test_streaming_trains_and_streams_end_to_end(tmp_path):
    """A streaming config goes through one real train step (the chunk bias
    inside the jitted loss) and the trained params stream exactly."""
    import jax

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 1}, online=False)
    model = get_model_class("conv-ctc").create_model(cfg)

    rng = np.random.RandomState(4)
    batch = {
        "feats": jnp.asarray(rng.randn(2, 32, 20).astype(np.float32)),
        "feat_lengths": jnp.asarray([32, 24], jnp.int32),
        "ids": jnp.asarray([[1, 3, 2, 0], [1, 4, 2, 0]], jnp.int32),
        "labels": jnp.asarray([[3, 2, 0, 0], [4, 2, 0, 0]], jnp.int32),
        "paddings": jnp.asarray(
            [[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0]], jnp.float32),
    }
    out = model.loss(model.params, batch,
                     {"dropout": jax.random.PRNGKey(0)}, train=True)
    assert np.isfinite(float(out["ctc_loss"]))


def test_streaming_pe_capacity_is_loud():
    """The batch forward fails loudly past its PE table; streaming must
    too — the position gather would otherwise clamp at the last row and
    silently drift exactly on the long-running streams the executor
    exists for."""
    cfg = _speech_cfg({"chunk": 4, "left_chunks": 1}, online=False)
    model = get_model_class("conv-ctc").create_model(cfg)
    rec = StreamingRecognizer(model, max_frames=8)  # two 4-frame chunks
    rng = np.random.RandomState(0)
    feats = rng.randn(1, 4 * rec.chunk_feats, 20).astype(np.float32)
    lens = np.array([feats.shape[1]])

    with pytest.raises(ValueError, match="positional-encoding capacity"):
        rec.decode_waves(feats, lens)

    # step-level guard fires even without the host driver
    state = rec.init_state(1)
    piece = feats[:, : rec.chunk_feats]
    state, _ = rec.step(state, piece)
    state, _ = rec.step(state, piece)
    with pytest.raises(ValueError, match="positional-encoding capacity"):
        rec.step(state, piece)

    # a wider table accepts the same stream and stays exact vs batch
    rec2 = StreamingRecognizer(model, max_frames=64)
    _, enc_s, enc_lens_s = rec2.decode_waves(feats, lens)
    enc_full, elens_full = _full_enc(
        model, jnp.asarray(feats), jnp.asarray(lens, jnp.int32)
    )
    n = int(enc_lens_s[0])
    assert n == int(np.asarray(elens_full)[0])
    np.testing.assert_allclose(
        enc_s[0, :n], np.asarray(enc_full)[0, :n], atol=2e-5, rtol=1e-5
    )


def test_streaming_beam_partials_match_batch_prefix_beam():
    """decode_waves(partial_beam=N): the streamed prefix-beam 1-best
    equals ctc_prefix_beam_device over the BATCH forward's log-probs —
    streaming beam decoding is exact, not an approximation (the
    executor's encoder states match the batch forward, and chunk
    boundaries don't exist in the beam recursion)."""
    from openasr_tpu.models import get_model_class
    from openasr_tpu.ops.ctc_beam_device import ctc_prefix_beam_device

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 2}, online=False)
    model = get_model_class(cfg.type).create_model(cfg)
    rec = StreamingRecognizer(model)

    rng = np.random.RandomState(5)
    feats = (rng.randn(2, 40, 20) * 0.5).astype(np.float32)
    lengths = np.asarray([40, 30], np.int32)

    partial_log = []
    hyps, _, _ = rec.decode_waves(
        feats, lengths, partial_beam=4,
        on_partial=lambda n, h: partial_log.append(h),
    )
    assert partial_log, "no partials emitted"
    assert hyps == partial_log[-1]

    logits, len_logits = model.get_logits(model.params, feats, lengths)
    import jax

    lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    blank = int(cfg.decoder["vocab_size"]) - 1
    ref_t, ref_l, _ = ctc_prefix_beam_device(
        lp, len_logits, blank=blank, beam=4
    )
    ref_t, ref_l = np.asarray(ref_t), np.asarray(ref_l)
    for bi in range(2):
        ref_best = [int(c) for c in ref_t[bi, 0, : ref_l[bi, 0]]]
        assert [int(c) for c in hyps[bi]] == ref_best, (
            bi, hyps[bi], ref_best
        )


def test_streaming_beam_partials_with_fusion_and_biasing():
    """decode_waves(partial_beam=N, lm_fusion=..., context_tables=...):
    the streamed FUSED + BIASED prefix-beam 1-best equals the one-shot
    fused+biased ctc_prefix_beam_device over the batch forward's
    log-probs (round-4 directive #3: streaming partials keep the
    accuracy features the offline beam has)."""
    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class
    from openasr_tpu.models.lm import make_lm_step_spec
    from openasr_tpu.ops.ctc_beam_device import (
        build_context_tables,
        ctc_prefix_beam_device,
    )

    cfg = _speech_cfg({"chunk": 4, "left_chunks": 2}, online=False)
    model = get_model_class(cfg.type).create_model(cfg)
    rec = StreamingRecognizer(model)
    vocab = int(cfg.decoder["vocab_size"])
    blank = vocab - 1

    lm = get_model_class("lstm_lm").create_model(Config({
        "vocab_size": vocab - 1, "d_model": 16, "n_layers": 1,
        "dropout_rate": 0.0,
    }))
    spec = make_lm_step_spec(lm)
    phrases = np.asarray([[4, 5, 4, -1]], np.int32)
    tables = build_context_tables(phrases, vocab)
    w_lm, w_ctx, beam = 0.5, 1.5, 4

    rng = np.random.RandomState(6)
    feats = (rng.randn(2, 40, 20) * 0.5).astype(np.float32)
    lengths = np.asarray([40, 28], np.int32)

    hyps, _, _ = rec.decode_waves(
        feats, lengths, partial_beam=beam,
        lm_fusion=dict(spec, weight=w_lm),
        context_tables=tables, context_weight=w_ctx,
    )

    logits, len_logits = model.get_logits(model.params, feats, lengths)
    import jax

    lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    init_cache = spec["init_cache_fn"](2 * beam, int(lp.shape[1]) + 1)
    ref_t, ref_l, _ = ctc_prefix_beam_device(
        lp, len_logits, blank=blank, beam=beam,
        lm_step_fn=spec["step_fn"], init_lm_cache=init_cache,
        lm_weight=w_lm, lm_params=spec["params"],
        context_phrases=phrases, context_weight=w_ctx,
    )
    ref_t, ref_l = np.asarray(ref_t), np.asarray(ref_l)
    for bi in range(2):
        ref_best = [int(c) for c in ref_t[bi, 0, : ref_l[bi, 0]]]
        assert [int(c) for c in hyps[bi]] == ref_best, (
            bi, hyps[bi], ref_best
        )
