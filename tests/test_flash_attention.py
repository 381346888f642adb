"""Flash-attention kernel correctness (CPU interpret mode) and its wiring
into the transformer layers.

On CPU the Pallas kernel runs through the interpreter, so shapes are kept
tiny; the TPU path is exercised by bench.py and the driver's compile checks.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the routing tests below force the Pallas path on tiny shapes; disable
# the measured min-length gate (production default routes short sequences
# to dense XLA attention)
os.environ["OPENASR_FLASH_MIN_LEN"] = "0"

from openasr_tpu.kernels import set_flash_attention
from openasr_tpu.kernels.flash_attention import (
    attention_dropout_mask,
    flash_attention,
)


def ref_attn(q, k, v, kv_lengths=None, causal=False, dropout_rate=0.0,
             dropout_seed=None):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / math.sqrt(d)
    kpos = jnp.arange(tk)
    if kv_lengths is not None:
        s = jnp.where(
            kpos[None, None, None, :] < kv_lengths[:, None, None, None],
            s, -1e30,
        )
    if causal:
        qpos = jnp.arange(tq)
        s = jnp.where(
            kpos[None, None, None, :] <= qpos[None, None, :, None], s, -1e30
        )
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        keep = attention_dropout_mask(dropout_seed, b, h, tq, tk, dropout_rate)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(
        q.dtype
    )


@pytest.mark.parametrize(
    "b,t,h,d,causal,use_len",
    [
        (2, 40, 2, 16, False, True),
        (1, 24, 1, 8, True, False),
        (2, 33, 2, 16, True, True),
    ],
)
def test_flash_matches_reference(b, t, h, d, causal, use_len):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    lens = (
        jnp.asarray(rng.randint(t // 2, t, b), jnp.int32) if use_len else None
    )
    out = flash_attention(
        q, k, v, kv_lengths=lens, causal=causal, block_q=16, block_k=16,
        interpret=True,
    )
    ref = ref_attn(q, k, v, lens, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match_reference():
    rng = np.random.RandomState(1)
    b, t, h, d = 2, 24, 2, 16
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    lens = jnp.asarray([20, 13], jnp.int32)

    def f1(q, k, v):
        return jnp.sum(
            jnp.sin(
                flash_attention(
                    q, k, v, kv_lengths=lens, causal=True, block_q=8,
                    block_k=8, interpret=True,
                )
            )
        )

    def f2(q, k, v):
        return jnp.sum(jnp.sin(ref_attn(q, k, v, lens, causal=True)))

    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_encoder_same_output_flash_vs_dense():
    """The encoder must produce identical valid-frame outputs whether
    attention runs through the Pallas kernel or the dense-bias XLA path."""
    from openasr_tpu.models.encoder import TransformerEncoder

    enc = TransformerEncoder(
        input_dim=8, d_model=16, nhead=2, dim_feedforward=32, num_layers=2
    )
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(2, 20, 8), jnp.float32)
    lengths = jnp.asarray([20, 11], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), feats, lengths)

    set_flash_attention(False)
    try:
        dense_out, dense_len = enc.apply(params, feats, lengths)
        set_flash_attention(True)
        flash_out, flash_len = enc.apply(params, feats, lengths)
    finally:
        set_flash_attention(None)

    assert np.array_equal(np.asarray(dense_len), np.asarray(flash_len))
    mask = np.arange(20)[None, :] < np.asarray(lengths)[:, None]
    np.testing.assert_allclose(
        np.asarray(flash_out)[mask], np.asarray(dense_out)[mask], atol=2e-4
    )


def test_decoder_loss_flash_vs_dense():
    """Training loss of the flagship model must agree between attention
    backends (valid positions only feed the loss)."""
    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class

    cfg = Config({
        "type": "conv-transformer",
        "add_eos": True,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer", "input_dim": 8, "d_model": 16,
                    "nhead": 2, "dim_feedforward": 32, "num_layers": 1,
                    "dropout_rate": 0.0},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 20,
                    "d_model": 16, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 16, "dim_feedforward": 32,
                    "dropout_rate": 0.0},
    })
    model = get_model_class(cfg.type).create_model(cfg)
    rng = np.random.RandomState(3)
    batch = {
        "feats": jnp.asarray(rng.randn(2, 24, 8), jnp.float32),
        "feat_lengths": jnp.asarray([24, 15], jnp.int32),
        "ids": jnp.asarray(rng.randint(3, 19, (2, 6)), jnp.int32),
        "labels": jnp.asarray(rng.randint(3, 19, (2, 6)), jnp.int32),
        "paddings": jnp.asarray(
            [[0, 0, 0, 0, 0, 0], [0, 0, 0, 1, 1, 1]], jnp.float32
        ),
    }
    set_flash_attention(False)
    try:
        dense = model.loss(model.params, batch, {}, train=False)
        set_flash_attention(True)
        flash = model.loss(model.params, batch, {}, train=False)
    finally:
        set_flash_attention(None)
    np.testing.assert_allclose(
        float(flash["ce_loss"]), float(dense["ce_loss"]), rtol=2e-4
    )


def test_flash_dropout_matches_masked_reference():
    """Forward parity: flash with in-kernel dropout == dense attention with
    the SAME stateless mask applied to the normalized weights
    (reference behavior: src/third_party/transformer.py:161-189)."""
    rng = np.random.RandomState(4)
    b, t, h, d = 2, 40, 2, 16
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    lens = jnp.asarray([40, 23], jnp.int32)
    seed = jnp.asarray([12345], jnp.uint32)
    rate = 0.3
    out = flash_attention(
        q, k, v, kv_lengths=lens, causal=True, block_q=16, block_k=16,
        dropout_rate=rate, dropout_seed=seed, interpret=True,
    )
    ref = ref_attn(q, k, v, lens, causal=True, dropout_rate=rate,
                   dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # mask sanity: keep fraction ~= 1 - rate, seed changes the mask
    keep = attention_dropout_mask(seed, b, h, t, t, rate)
    assert abs(float(jnp.mean(keep)) - (1.0 - rate)) < 0.02
    keep2 = attention_dropout_mask(seed + 1, b, h, t, t, rate)
    assert float(jnp.mean(keep == keep2)) < 0.95
    # per-(batch, head) masks differ
    assert not np.array_equal(np.asarray(keep[0, 0]), np.asarray(keep[0, 1]))


def test_flash_dropout_block_size_invariant():
    """The positional-hash mask depends only on global positions, so the
    output must be identical across block sizes (fwd visits tiles in a
    different order than bwd — this is the property that makes the
    backward recompute exact)."""
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(1, 32, 2, 8), jnp.float32)
    seed = jnp.asarray([7], jnp.uint32)
    outs = [
        np.asarray(
            flash_attention(
                q, q, q, causal=False, block_q=bq, block_k=bk,
                dropout_rate=0.25, dropout_seed=seed, interpret=True,
            )
        )
        for bq, bk in ((8, 8), (16, 16), (32, 32), (8, 16))
    ]
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], atol=1e-6)


def test_flash_dropout_gradients_match_reference():
    rng = np.random.RandomState(6)
    b, t, h, d = 2, 24, 2, 16
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    lens = jnp.asarray([24, 17], jnp.int32)
    seed = jnp.asarray([99], jnp.uint32)
    rate = 0.2

    def f1(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(
            q, k, v, kv_lengths=lens, causal=True, block_q=8, block_k=8,
            dropout_rate=rate, dropout_seed=seed, interpret=True,
        )))

    def f2(q, k, v):
        return jnp.sum(jnp.sin(ref_attn(
            q, k, v, lens, causal=True, dropout_rate=rate, dropout_seed=seed
        )))

    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_mha_flash_train_applies_dropout():
    """With dropout_rate > 0 and deterministic=False the flash path must
    regularize (output differs from the deterministic pass) and stay
    deterministic given the same rng."""
    from openasr_tpu.models.layers import MultiHeadAttention

    mha = MultiHeadAttention(d_model=16, nhead=2, dropout_rate=0.3)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 20, 16), jnp.float32)
    lens = jnp.asarray([20, 12], jnp.int32)
    params = mha.init(jax.random.PRNGKey(0), x, x, kv_lengths=lens)

    set_flash_attention(True)
    try:
        det = mha.apply(params, x, x, kv_lengths=lens, deterministic=True)
        tr1 = mha.apply(params, x, x, kv_lengths=lens, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        tr1b = mha.apply(params, x, x, kv_lengths=lens, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        tr2 = mha.apply(params, x, x, kv_lengths=lens, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    finally:
        set_flash_attention(None)

    assert not np.allclose(np.asarray(det), np.asarray(tr1))
    np.testing.assert_array_equal(np.asarray(tr1), np.asarray(tr1b))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))


def test_zero_valid_keys_row_is_safe():
    """A row with kv_length == 0 must output zeros with zero gradients
    (guards the exp(NEG_INF - NEG_INF) == 1 degenerate case)."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 16, 2, 8), jnp.float32)
    lens = jnp.asarray([16, 0], jnp.int32)
    out = flash_attention(
        q, q, q, kv_lengths=lens, interpret=True, block_q=8, block_k=8
    )
    assert float(jnp.max(jnp.abs(out[1]))) == 0.0

    g = jax.grad(
        lambda x: jnp.sum(
            flash_attention(
                x, x, x, kv_lengths=lens, interpret=True, block_q=8,
                block_k=8,
            )
        )
    )(q)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.max(jnp.abs(g[1]))) == 0.0


def test_min_len_gate_routes_short_to_dense():
    """With the measured default gate, short sequences use the dense path
    even when flash is enabled (device-lane measurement: dense is 3.5x
    faster at T=128 fwd+bwd); long sequences use the kernel."""
    from openasr_tpu.kernels import (
        flash_attention_max_len,
        flash_attention_min_len,
    )

    old = os.environ.pop("OPENASR_FLASH_MIN_LEN", None)
    try:
        assert flash_attention_min_len() == 384  # measured default
        assert flash_attention_max_len() == 0
        os.environ["OPENASR_FLASH_MIN_LEN"] = "128"
        assert flash_attention_min_len() == 128
    finally:
        if old is not None:
            os.environ["OPENASR_FLASH_MIN_LEN"] = old
        else:
            os.environ.pop("OPENASR_FLASH_MIN_LEN", None)
        os.environ["OPENASR_FLASH_MIN_LEN"] = "0"  # module-level test env


def test_long_sequence_decode_equivalence_flash_vs_dense():
    """Decode-equivalence at attention length >= 512 (where the Pallas
    route engages by default): same params, same batch — identical CTC
    logits and identical greedy hypotheses through the flash kernel vs
    the dense XLA path."""
    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class

    cfg = Config({
        "type": "conv-ctc",
        "add_eos": False,
        "add_blk": True,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 8, "d_model": 16, "nhead": 2,
                    "dim_feedforward": 32, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.1},
        "decoder": {"vocab_size": 8},
    })
    model = get_model_class(cfg.type).create_model(cfg)

    rng = np.random.RandomState(5)
    t = 1030  # 1-layer ConvV2 subsample /2 -> attention length >= 512
    feats = jnp.asarray(rng.randn(2, t, 8), jnp.float32)
    lengths = jnp.asarray([t, t - 100], jnp.int32)

    set_flash_attention(False)
    try:
        jax.clear_caches()
        dense_logits, dense_lens = model.get_logits(
            model.params, feats, lengths
        )
        dense_ids, dense_idlens = model.greedy_decode(
            model.params, feats, lengths
        )
        set_flash_attention(True)
        jax.clear_caches()
        flash_logits, flash_lens = model.get_logits(
            model.params, feats, lengths
        )
        flash_ids, flash_idlens = model.greedy_decode(
            model.params, feats, lengths
        )
    finally:
        set_flash_attention(None)
        jax.clear_caches()

    assert int(dense_lens[0]) >= 512, "attention length below flash regime"
    assert np.array_equal(np.asarray(dense_lens), np.asarray(flash_lens))
    mask = (
        np.arange(dense_logits.shape[1])[None, :]
        < np.asarray(dense_lens)[:, None]
    )
    np.testing.assert_allclose(
        np.asarray(flash_logits)[mask], np.asarray(dense_logits)[mask],
        atol=2e-4,
    )
    # identical hypotheses, not merely close scores
    assert np.array_equal(np.asarray(dense_idlens), np.asarray(flash_idlens))
    for i in range(2):
        n = int(dense_idlens[i])
        assert np.array_equal(
            np.asarray(dense_ids)[i, :n], np.asarray(flash_ids)[i, :n]
        ), f"hypothesis {i} differs between attention backends"


def test_vmem_guard_block_selection():
    """Block sizes must shrink with the per-program head budget (and one
    step earlier when in-kernel dropout is active) so large-head configs
    route to smaller tiles instead of a Mosaic scoped-VMEM failure."""
    from openasr_tpu.kernels.flash_attention import (
        DEFAULT_BLOCK_K,
        DEFAULT_BLOCK_Q,
        _vmem_guarded_blocks,
    )

    # the validated default: 8 heads x 64 dim, no dropout
    assert _vmem_guarded_blocks(8, 64, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                                0.0) == (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    # dropout at the same budget: one block_k halving (the measured 56 KB
    # scoped-VMEM overflow of the dkv backward at B=64, T=512)
    assert _vmem_guarded_blocks(8, 64, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                                0.1) == (DEFAULT_BLOCK_Q,
                                         DEFAULT_BLOCK_K // 2)
    # 16 heads x 64: halve block_k
    bq, bk = _vmem_guarded_blocks(16, 64, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                                  0.0)
    assert (bq, bk) == (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K // 2)
    # extreme budget: k block floors at 128, then q shrinks; never below
    # the tiling minima
    bq, bk = _vmem_guarded_blocks(32, 128, DEFAULT_BLOCK_Q,
                                  DEFAULT_BLOCK_K, 0.1)
    assert bk == 128 and 32 <= bq < DEFAULT_BLOCK_Q


def test_large_head_config_runs_interpret():
    """A config over the validated head budget must still produce correct
    output (through the scaled-down blocks), not a compile failure."""
    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(1, 64, 16, 64) * 0.1, jnp.float32)
    lens = jnp.asarray([50], jnp.int32)
    out = flash_attention(q, q, q, kv_lengths=lens, interpret=True)
    from openasr_tpu.models.layers import dot_product_attention
    from openasr_tpu.ops.masks import padding_bias

    ref = dot_product_attention(q, q, q, padding_bias(lens, 64))
    np.testing.assert_allclose(
        np.asarray(out)[:, :50], np.asarray(ref)[:, :50], atol=2e-5
    )
