"""Model framework tests: creation, loss, decode, package/restore."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.ops.ctc_decode import ctc_greedy_decode, ctc_shrink_ids


def small_cfg(model_type="conv-ctc-transformer", vocab=30):
    return Config({
        "type": model_type,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer", "sub": {"type": "ConvV2", "layer_num": 2},
                    "input_dim": 40, "d_model": 64, "nhead": 4,
                    "dim_feedforward": 128, "activation": "glu",
                    "num_layers": 2, "dropout_rate": 0.1},
        "decoder": {"type": "TransformerDecoder", "vocab_size": vocab,
                    "d_model": 64, "nhead": 4, "num_layers": 2,
                    "encoder_dim": 64, "dim_feedforward": 128,
                    "activation": "glu", "dropout_rate": 0.1},
    })


def feasible_batch(vocab=30, B=4, T=96, D=40, U=6):
    rng = np.random.RandomState(0)
    batch = {
        "feats": rng.randn(B, T, D).astype(np.float32),
        "feat_lengths": np.array([96, 90, 80, 72], np.int32),
        "ids": rng.randint(3, vocab - 1, (B, U)).astype(np.int32),
        "labels": rng.randint(3, vocab - 1, (B, U)).astype(np.int32),
        "paddings": np.zeros((B, U), np.float32),
    }
    batch["ids"][:, 0] = 1
    batch["paddings"][:, 4:] = 1.0
    return batch


def test_conv_ctc_transformer_losses_finite():
    cfg = small_cfg()
    model = get_model_class(cfg.type).create_model(cfg)
    batch = feasible_batch()
    out = model.loss(
        model.params, batch,
        {"dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)},
        train=True, label_smooth=0.1,
    )
    assert np.isfinite(float(out["ctc_loss"]))
    assert np.isfinite(float(out["ce_loss"]))
    assert float(out["n_tokens"]) == 16.0  # 4 rows x 4 valid


def test_eval_mode_is_deterministic():
    cfg = small_cfg()
    model = get_model_class(cfg.type).create_model(cfg)
    batch = feasible_batch()
    a = model.loss(model.params, batch, {}, train=False)
    b = model.loss(model.params, batch, {}, train=False)
    assert float(a["ce_loss"]) == float(b["ce_loss"])


def test_beam_decode_shapes_and_order():
    cfg = small_cfg("conv-transformer")
    model = get_model_class(cfg.type).create_model(cfg)
    batch = feasible_batch()
    preds, lens, scores = model.batch_beam_decode(
        model.params, batch["feats"], batch["feat_lengths"],
        beam_size=4, max_decode_len=10,
    )
    assert preds.shape == (4, 4, 10)
    assert lens.shape == scores.shape == (4, 4)
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-6)  # sorted descending
    assert np.all(np.asarray(lens) <= 10)


def test_beam_decode_jit_compiles():
    cfg = small_cfg("conv-transformer")
    model = get_model_class(cfg.type).create_model(cfg)
    batch = feasible_batch()

    decode = jax.jit(
        lambda p, x, l: model.batch_beam_decode(p, x, l, beam_size=2, max_decode_len=8)
    )
    preds, lens, scores = decode(model.params, batch["feats"], batch["feat_lengths"])
    preds2, lens2, scores2 = decode(model.params, batch["feats"], batch["feat_lengths"])
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(preds2))


def test_package_restore_roundtrip():
    cfg = small_cfg()
    cls = get_model_class(cfg.type)
    model = cls.create_model(cfg, rng=jax.random.PRNGKey(7))
    batch = feasible_batch()
    pkg = model.package()

    other = cls.create_model(cfg, rng=jax.random.PRNGKey(99))
    before = float(other.loss(other.params, batch, {}, train=False)["ce_loss"])
    other.restore(pkg)
    after = float(other.loss(other.params, batch, {}, train=False)["ce_loss"])
    want = float(model.loss(model.params, batch, {}, train=False)["ce_loss"])
    assert after == pytest.approx(want)
    assert before != pytest.approx(want)


def test_restore_config_mismatch_raises():
    cfg = small_cfg()
    cls = get_model_class(cfg.type)
    model = cls.create_model(cfg)
    pkg = model.package()
    cfg2 = Config(cfg.to_dict())
    cfg2.encoder["d_model"] = 128
    cfg2.encoder["input_dim"] = 40
    other = cls.create_model(cfg2)
    with pytest.raises(ValueError, match="mismatch"):
        other.restore(pkg)


def test_restore_tolerates_dropout_drift():
    cfg = small_cfg()
    cls = get_model_class(cfg.type)
    model = cls.create_model(cfg)
    pkg = model.package()
    cfg2 = Config(cfg.to_dict())
    cfg2.encoder["dropout_rate"] = 0.3
    other = cls.create_model(cfg2)
    other.restore(pkg)  # should not raise


def test_without_fc_partial_restore():
    cfg = small_cfg("conv-transformer")
    cls = get_model_class(cfg.type)
    model = cls.create_model(cfg, rng=jax.random.PRNGKey(1))
    pkg = model.package()
    other = cls.create_model(cfg, rng=jax.random.PRNGKey(2))
    fresh_emb = np.asarray(other.params["decoder"]["emb"]["embedding"])
    other.restore(pkg, without_fc=True)
    # decoder kept fresh init, encoder restored
    np.testing.assert_array_equal(
        np.asarray(other.params["decoder"]["emb"]["embedding"]), fresh_emb
    )
    np.testing.assert_array_equal(
        np.asarray(other.params["encoder"]["final_norm"]["scale"]),
        np.asarray(model.params["encoder"]["final_norm"]["scale"]),
    )


def test_ctc_shrink():
    path = np.array([[5, 5, 9, 3, 3, 9, 5, 9]], np.int32)  # blank = 9
    ids, lens = ctc_shrink_ids(path, np.array([8], np.int32), blank_id=9)
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(ids)[0, :3], [5, 3, 5])


def test_ctc_greedy_decode_respects_lengths():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 10, 6).astype(np.float32)
    ids_full, lens_full = ctc_greedy_decode(logits, np.array([10, 4], np.int32))
    ids_half, lens_half = ctc_greedy_decode(logits[:, :4], np.array([4, 4], np.int32))
    # row 1 truncated at 4 gives same tokens either way
    np.testing.assert_array_equal(
        np.asarray(ids_full)[1, : int(lens_full[1])],
        np.asarray(ids_half)[1, : int(lens_half[1])],
    )


def test_online_fbank_model():
    cfg = small_cfg("conv-transformer")
    cfg.signal = {
        "feature_type": "fbank", "sample_rate": 16000, "num_mel_bins": 40,
        "use_energy": False,
        "spec_aug": {"freq_mask_num": 1, "freq_mask_width": 8,
                     "time_mask_num": 1, "time_mask_width": 8},
    }
    model = get_model_class(cfg.type).create_model(cfg)
    rng = np.random.RandomState(0)
    waves = (rng.randn(2, 16000) * 1000).astype(np.float32)
    batch = {
        "waves": waves,
        "wave_lengths": np.array([16000, 8000], np.int32),
        "ids": np.array([[1, 5, 6], [1, 7, 2]], np.int32),
        "labels": np.array([[5, 6, 2], [7, 2, 2]], np.int32),
        "paddings": np.array([[0, 0, 0], [0, 0, 1]], np.float32),
    }
    out = model.loss(
        model.params, batch,
        {"dropout": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)},
        train=True,
    )
    assert np.isfinite(float(out["ce_loss"]))


def test_remat_layers_match_baseline():
    """encoder.remat / decoder.remat rematerialize per layer and must be
    bit-identical to the baseline (same RNG threading)."""
    import jax
    import jax.numpy as jnp

    from openasr_tpu.models.encoder import TransformerEncoder

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 20, 8), jnp.float32)
    lens = jnp.asarray([20, 13], jnp.int32)

    def make(remat):
        return TransformerEncoder(
            input_dim=8, d_model=16, nhead=2, dim_feedforward=32,
            num_layers=2, dropout_rate=0.1, remat=remat,
        )

    params = make(False).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, lens,
    )

    def loss(p, remat):
        out, _ = make(remat).apply(
            p, feats, lens, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(out ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, True)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attention_maps_capture():
    """Framework.attention_maps returns every attention distribution of a
    deterministic forward (parity with the reference vendored
    transformer's return_atten, third_party/transformer.py:161-189):
    per-layer encoder self / decoder self / decoder cross maps, rows
    normalized, padded key frames carrying ~zero mass."""
    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class

    cfg = Config({
        "type": "conv-ctc-transformer", "add_eos": True, "add_blk": True,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 16, "nhead": 2,
                    "dim_feedforward": 32, "activation": "relu",
                    "num_layers": 2, "dropout_rate": 0.1},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 11,
                    "d_model": 16, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 16, "dim_feedforward": 32,
                    "activation": "relu", "dropout_rate": 0.1},
    })
    m = get_model_class(cfg.type).create_model(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "feats": rng.randn(2, 24, 20).astype(np.float32),
        "feat_lengths": np.array([24, 12], np.int32),
        "ids": rng.randint(3, 10, (2, 5)).astype(np.int32),
        "labels": rng.randint(3, 10, (2, 5)).astype(np.int32),
        "paddings": np.zeros((2, 5), np.float32),
    }
    maps = m.attention_maps(batch)
    assert {
        "encoder/layer0/self_attn", "encoder/layer1/self_attn",
        "decoder/layer0/self_attn", "decoder/layer0/cross_attn",
    } <= set(maps)
    enc = np.asarray(maps["encoder/layer0/self_attn"])  # [B, H, Tq, Tk]
    assert enc.ndim == 4 and enc.shape[1] == 2
    np.testing.assert_allclose(enc.sum(-1), 1.0, atol=1e-5)
    # row 1 is only 12 frames -> (12-1)//2 = 5 valid encoder positions
    # after the 1-layer ConvV2; the padded tail must get no weight
    valid = (12 - 1) // 2
    assert enc[1, :, :, valid:].max() < 1e-6
    cross = np.asarray(maps["decoder/layer0/cross_attn"])
    assert cross.shape[-2:] == (5, enc.shape[-1])
    avg = m.attention_maps(batch, average_heads=True)
    assert np.asarray(avg["encoder/layer0/self_attn"]).shape == enc[:, 0].shape


def test_folded_affine_equals_transpose_reshape_dense():
    """The subsamplers' _FoldedAffine (transpose folded into a two-dim
    contraction — kills two [B,T,C,D] layout copies per step on TPU) is
    numerically the old `x.transpose(0,1,3,2).reshape(b,t,c*d) @ W + b`
    with the IDENTICAL param tree (kernel [C*D, M] rows ordered c*D+d)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from openasr_tpu.models.subsample import _FoldedAffine

    b, t, d, c, m = 2, 5, 7, 3, 11
    mod = _FoldedAffine(m, c=c, d=d)
    x = jnp.asarray(np.random.RandomState(0).randn(b, t, d, c),
                    jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    assert params["kernel"].shape == (c * d, m)  # checkpoint layout
    assert params["bias"].shape == (m,)
    y = mod.apply({"params": params}, x)
    ref = (
        x.transpose(0, 1, 3, 2).reshape(b, t, c * d)
        @ params["kernel"] + params["bias"]
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
