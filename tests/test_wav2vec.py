"""wav2vec_ctc family: forward, CTC training step, freeze_finetune_updates
gating, CPC-frontend warm start."""

import numpy as np
import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.parallel import make_mesh, shard_batch
from openasr_tpu.solvers import array_fields, get_solver_class


def make_cfg(vocab=12, freeze=0):
    return Config({
        "type": "wav2vec_ctc",
        "add_blk": True,
        "signal": {"feature_type": "wave"},
        "encoder": {"d_model": 16, "nhead": 2, "num_layers": 1,
                    "dim_feedforward": 32, "conv_dim": 8,
                    "dropout_rate": 0.0,
                    "freeze_finetune_updates": freeze},
        "decoder": {"vocab_size": vocab},
    })


def make_batch(b=2, n=3200, vocab=12, u=4):
    rng = np.random.RandomState(0)
    return {
        "waves": jnp.asarray(rng.randn(b, n), jnp.float32),
        "wave_lengths": jnp.asarray([n, n // 2], jnp.int32),
        "ids": jnp.asarray(rng.randint(1, vocab - 1, (b, u)), jnp.int32),
        "labels": jnp.asarray(rng.randint(1, vocab - 1, (b, u)), jnp.int32),
        "paddings": jnp.zeros((b, u), jnp.float32),
    }


def test_forward_and_loss():
    model = get_model_class("wav2vec_ctc").create_model(make_cfg())
    batch = make_batch()
    losses = model.loss(
        model.params, batch, {}, train=False,
    )
    assert np.isfinite(float(losses["ctc_loss"]))
    toks, lens = model.greedy_decode(
        model.params, batch["waves"], batch["wave_lengths"]
    )
    assert toks.shape[0] == 2


def test_freeze_finetune_updates_gates_frontend():
    model = get_model_class("wav2vec_ctc").create_model(make_cfg(freeze=2))
    assert model.freeze_gate == (("encoder",), 2)
    training = Config({
        "num_epoch": 1, "exp_dir": "/tmp/w2v_test", "print_inteval": 1000,
        "init_lr": 1e-2, "optimtype": "adam", "grad_max_norm": 5.0,
        "lr_scheduler": {"type": "linear", "x0": 0, "y0": 1.0,
                         "x1": 1000, "y1": 1.0},
    })
    solver = get_solver_class("wav2vec_ctc")(
        model, training, [], [], mesh=make_mesh(jax.devices("cpu")[:2])
    )
    batch = shard_batch(array_fields(make_batch()), solver.mesh)
    rng = jax.random.PRNGKey(0)

    def frontend_of(params):
        return jax.tree_util.tree_leaves(params["encoder"]["frontend"])[0]

    def fc_of(params):
        return jax.tree_util.tree_leaves(params["fc"])[0]

    p0_front = np.asarray(frontend_of(model.params)).copy()
    p0_fc = np.asarray(fc_of(model.params)).copy()

    params, opt_state = model.params, solver.opt_state
    # steps 1 and 2: frontend must stay frozen, fc must move
    for i in range(2):
        params, opt_state, loss, _ = solver._train_step(
            params, opt_state, batch, jax.random.fold_in(rng, i)
        )
    np.testing.assert_array_equal(np.asarray(frontend_of(params)), p0_front)
    assert not np.array_equal(np.asarray(fc_of(params)), p0_fc)
    # step 3: gate opens, frontend moves
    params, opt_state, loss, _ = solver._train_step(
        params, opt_state, batch, jax.random.fold_in(rng, 99)
    )
    assert not np.array_equal(np.asarray(frontend_of(params)), p0_front)


def test_load_frontend_from_cpc_package():
    from openasr_tpu.models.cpc import CPCModel

    cpc_cfg = Config({
        "type": "encoder_cpc",
        "signal": {"d_model": 8},
        "cpc": {"d_input": 8, "d_coding": 8, "n_layers": 1, "n_steps": 2},
    })
    cpc = get_model_class("encoder_cpc").create_model(cpc_cfg)
    pkg = cpc.package()

    model = get_model_class("wav2vec_ctc").create_model(make_cfg())
    model.load_frontend(pkg)
    got = jax.tree_util.tree_leaves(model.params["encoder"]["frontend"])[0]
    want = jax.tree_util.tree_leaves(pkg["components"]["splayer"])[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fairseq_context_network_mapping():
    """map_fairseq_context_network parity against an independent NumPy
    implementation of fairseq's post-LN TransformerSentenceEncoderLayer
    (layer_norm_first=False) on a synthetic fairseq-named state dict."""
    import jax.numpy as jnp

    from openasr_tpu.models.layers import TransformerEncoderLayer
    from openasr_tpu.models.wav2vec import map_fairseq_context_network

    rng = np.random.RandomState(0)
    d, nhead, ffn, layers = 16, 2, 32, 2
    dh = d // nhead

    state = {}
    for n in range(layers):
        pre = f"encoder.layers.{n}"
        for name in ("q", "k", "v", "out"):
            state[f"{pre}.self_attn.{name}_proj.weight"] = (
                rng.randn(d, d).astype(np.float32) * 0.2
            )
            state[f"{pre}.self_attn.{name}_proj.bias"] = (
                rng.randn(d).astype(np.float32) * 0.1
            )
        state[f"{pre}.self_attn_layer_norm.weight"] = (
            1.0 + 0.1 * rng.randn(d).astype(np.float32)
        )
        state[f"{pre}.self_attn_layer_norm.bias"] = (
            0.1 * rng.randn(d).astype(np.float32)
        )
        state[f"{pre}.fc1.weight"] = rng.randn(ffn, d).astype(np.float32) * 0.2
        state[f"{pre}.fc1.bias"] = rng.randn(ffn).astype(np.float32) * 0.1
        state[f"{pre}.fc2.weight"] = rng.randn(d, ffn).astype(np.float32) * 0.2
        state[f"{pre}.fc2.bias"] = rng.randn(d).astype(np.float32) * 0.1
        state[f"{pre}.final_layer_norm.weight"] = (
            1.0 + 0.1 * rng.randn(d).astype(np.float32)
        )
        state[f"{pre}.final_layer_norm.bias"] = (
            0.1 * rng.randn(d).astype(np.float32)
        )

    def np_ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-6) * w + b

    def np_gelu(x):
        from scipy.stats import norm as _norm

        return x * _norm.cdf(x)

    def np_fairseq_layer(x, pre):
        # post-LN: residual -> self_attn_layer_norm; residual -> final_ln
        def lin(name, v):
            return v @ state[f"{pre}.{name}.weight"].T + state[f"{pre}.{name}.bias"]

        b, t_, _ = x.shape
        q = lin("self_attn.q_proj", x).reshape(b, t_, nhead, dh)
        k = lin("self_attn.k_proj", x).reshape(b, t_, nhead, dh)
        v = lin("self_attn.v_proj", x).reshape(b, t_, nhead, dh)
        s = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dh)
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        attn = np.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t_, d)
        attn = lin("self_attn.out_proj", attn)
        x = np_ln(x + attn, state[f"{pre}.self_attn_layer_norm.weight"],
                  state[f"{pre}.self_attn_layer_norm.bias"])
        h = np_gelu(lin("fc1", x))
        h = lin("fc2", h)
        return np_ln(x + h, state[f"{pre}.final_layer_norm.weight"],
                     state[f"{pre}.final_layer_norm.bias"])

    b, t = 2, 12
    x = rng.randn(b, t, d).astype(np.float32)
    ref = x.copy()
    for n in range(layers):
        ref = np_fairseq_layer(ref, f"encoder.layers.{n}")

    # build our layer params, map fairseq weights in, run our stack
    layer = TransformerEncoderLayer(d, nhead, ffn, 0.0, "gelu")
    lens = jnp.asarray([t, t], jnp.int32)
    enc_params = {}
    for n in range(layers):
        enc_params[f"layer{n}"] = layer.init(
            jax.random.PRNGKey(n), jnp.asarray(x), kv_lengths=lens
        )["params"]
    mapped = map_fairseq_context_network(state, enc_params, nhead)

    out = jnp.asarray(x)
    for n in range(layers):
        out = layer.apply(
            {"params": mapped[f"layer{n}"]}, out, kv_lengths=lens
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    # unmapped-topology guard
    import pytest

    with pytest.raises(ValueError):
        map_fairseq_context_network({"foo": 1}, enc_params, nhead)
