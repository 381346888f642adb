"""Mixture-of-Experts routing + expert parallelism (models/moe.py).

Beyond-reference capability (the reference has no sparse scaling story).
Guarantees:

  1. Semantics: the dense one-hot dispatch/combine formulation computes
     exactly y[token] = Σ_j gate_j · FFN_{e_j}(x[token]) — checked against
     a per-token python oracle, and against a plain FFN for E=1.
  2. Capacity: overflow tokens contribute 0 (residual passthrough);
     padding tokens never consume expert capacity.
  3. Load-balance auxiliary: the Switch-style aux is exactly 1.0 for a
     uniform router and is collected into the training objective.
  4. Expert parallelism: expert tables shard over 'data'
     (parallel/mesh.py:_moe_entries), ZeRO-1 leaves them alone, and
     train steps are numerically identical across single-device, dp8,
     and dp4xtp2 meshes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.models.moe import MoEFeedForward
from openasr_tpu.parallel import make_mesh, shard_batch
from openasr_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    param_shardings,
    zero1_sharding,
)
from openasr_tpu.solvers import array_fields, get_solver_class

from test_tensor_parallel import _make_batch, _params_allclose
from test_train_e2e import model_config


def _init_moe(d=16, f=32, experts=4, top_k=2, cf=8.0, t=12, b=2, seed=0):
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (b, t, d))
    mod = MoEFeedForward(d, f, num_experts=experts, top_k=top_k,
                         capacity_factor=cf)
    params = mod.init({"params": rng}, x)["params"]
    return mod, params, x


def _apply(mod, params, x, pad_mask=None):
    y, coll = mod.apply({"params": params}, x, True, pad_mask,
                        mutable=["moe"])
    (aux,) = jax.tree_util.tree_leaves(coll["moe"])
    return np.asarray(y), float(aux)


def _expert_ffn(params, e, v):
    w1, b1 = np.asarray(params["w1"], np.float64), np.asarray(params["b1"], np.float64)
    w2, b2 = np.asarray(params["w2"], np.float64), np.asarray(params["b2"], np.float64)
    return np.maximum(v @ w1[e] + b1[e], 0) @ w2[e] + b2[e]


def _router(params, x, k):
    lg = np.asarray(x, np.float32) @ np.asarray(params["router"]["kernel"])
    lg = lg + np.asarray(params["router"]["bias"])
    g = np.asarray(jax.nn.softmax(jnp.asarray(lg), axis=-1))
    tg, ti = jax.lax.top_k(jnp.asarray(g), k)
    tg = tg / jnp.maximum(tg.sum(-1, keepdims=True), 1e-9)
    return g, np.asarray(tg), np.asarray(ti)


def test_single_expert_equals_dense_ffn():
    mod, params, x = _init_moe(experts=1, top_k=1)
    y, _ = _apply(mod, params, x)
    ref = _expert_ffn(params, 0, np.asarray(x, np.float64))
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_topk_matches_per_token_oracle():
    """No capacity pressure: every token's output is its gate-weighted
    top-k expert mixture, token by token."""
    mod, params, x = _init_moe(experts=4, top_k=2, cf=8.0)
    y, aux = _apply(mod, params, x)
    _, tg, ti = _router(params, x, 2)
    B, T, _ = x.shape
    ref = np.zeros_like(y, np.float64)
    for b in range(B):
        for t in range(T):
            for j in range(2):
                ref[b, t] += tg[b, t, j] * _expert_ffn(
                    params, int(ti[b, t, j]), np.asarray(x[b, t], np.float64)
                )
    np.testing.assert_allclose(y, ref, atol=1e-5)
    assert np.isfinite(aux) and aux > 0


def _rig_router(params, expert=0, strength=20.0):
    """Point every token's top-1 at one expert."""
    p = jax.tree_util.tree_map(np.asarray, params)
    p["router"]["kernel"] = np.zeros_like(p["router"]["kernel"])
    bias = np.zeros_like(p["router"]["bias"])
    bias[expert] = strength
    p["router"]["bias"] = bias
    return p


def test_capacity_overflow_drops_tokens():
    """All tokens routed to expert 0 with capacity C < T: the first C
    tokens (GShard position order = time order) get expert output, the
    rest get exactly 0 (they survive via the layer's residual add)."""
    t = 8
    mod, params, x = _init_moe(experts=4, top_k=1, cf=1.0, t=t, b=1)
    params = _rig_router(params)
    # C = ceil(T * k * cf / E) = ceil(8 / 4) = 2
    y, _ = _apply(mod, params, x)
    _, tg, _ = _router(params, x, 1)
    for tok in range(t):
        ref = tg[0, tok, 0] * _expert_ffn(
            params, 0, np.asarray(x[0, tok], np.float64)
        )
        if tok < 2:
            np.testing.assert_allclose(y[0, tok], ref, atol=1e-5)
        else:
            np.testing.assert_allclose(y[0, tok], 0.0, atol=1e-6)


def test_padding_never_consumes_capacity():
    """Padding tokens produce 0 and do not occupy expert slots: with
    pad_mask [1,0,1,1,0,1] and C=2, the kept tokens are the first two
    VALID ones (0 and 2), not positions 0 and 1."""
    mod, params, x = _init_moe(experts=4, top_k=1, cf=1.0, t=6, b=1)
    params = _rig_router(params)
    # C = ceil(6 * 1 * 1.0 / 4) = 2
    pad_mask = jnp.asarray([[1, 0, 1, 1, 0, 1]], jnp.float32)
    y, _ = _apply(mod, params, x, pad_mask)
    _, tg, _ = _router(params, x, 1)
    kept = {0, 2}
    for tok in range(6):
        if tok in kept:
            ref = tg[0, tok, 0] * _expert_ffn(
                params, 0, np.asarray(x[0, tok], np.float64)
            )
            np.testing.assert_allclose(y[0, tok], ref, atol=1e-5)
        else:  # dropped valid (3, 5) and padding (1, 4)
            np.testing.assert_allclose(y[0, tok], 0.0, atol=1e-6)


def test_uniform_router_aux_is_one():
    """Switch aux = E * Σ_e fraction_e · prob_e: a uniform router gives
    prob_e = 1/E and (deterministic tie-break) fraction = one-hot, so
    aux = 1.0 — the documented minimum for balanced routing."""
    mod, params, x = _init_moe(experts=4, top_k=2)
    p = jax.tree_util.tree_map(np.asarray, params)
    p["router"]["kernel"] = np.zeros_like(p["router"]["kernel"])
    p["router"]["bias"] = np.zeros_like(p["router"]["bias"])
    _, aux = _apply(mod, p, x)
    assert np.isclose(aux, 1.0, atol=1e-5), aux


# ------------------------------------------------------- model integration

def _moe_model_config(vocab=8):
    cfg = model_config(vocab)
    enc = dict(cfg.encoder.to_dict())
    enc["num_layers"] = 2
    # 8 experts: divisible by dp8's and dp4xtp2's data axes, so the
    # parity test exercises real expert sharding on both
    enc["moe"] = {"num_experts": 8, "top_k": 2, "capacity_factor": 2.0,
                  "every": 2, "aux_weight": 0.01}
    d = cfg.to_dict()
    d["encoder"] = enc
    return Config(d)


def _moe_solver(mesh, tmp_path, tag):
    cfg = _moe_model_config()
    model = get_model_class(cfg.type).create_model(cfg)
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / f"exp_{tag}"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1, "lambda_ctc": 0.5,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 32},
    })
    return get_solver_class(cfg.type)(model, training, [], [], mesh=mesh), model


def test_moe_layers_only_every_nth():
    model = get_model_class("conv-ctc-transformer").create_model(
        _moe_model_config()
    )
    flat = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(model.params)[0]
    }
    assert any("layer1" in k and "moe_ffn" in k for k in flat)
    assert not any("layer0" in k and "moe_ffn" in k for k in flat)
    assert any("layer0" in k and "'ffn'" in k for k in flat)


def test_param_shardings_expert_axis():
    """_moe_entries: expert tables get 'data' on the expert dim (EP), the
    FFN inner dim additionally gets 'model' under TP; the router stays
    replicated; ZeRO-1 declines leaves already data-sharded."""
    model = get_model_class("conv-ctc-transformer").create_model(
        _moe_model_config()
    )
    cpus = jax.devices("cpu")
    mesh = make_mesh(cpus[:8], model=2)  # dp4 x tp2
    shardings = param_shardings(model.params, mesh)
    flat = {
        jax.tree_util.keystr(p): s.spec
        for p, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    }
    moe = {k: v for k, v in flat.items() if "moe_ffn" in k}
    assert moe, "no moe_ffn leaves in the sharding tree"
    for k, spec in moe.items():
        entries = tuple(spec)
        if "router" in k:
            assert DATA_AXIS not in entries and MODEL_AXIS not in entries, (k, spec)
        else:
            assert entries and entries[0] == DATA_AXIS, (k, spec)
            if "w1" in k or "b1" in k or "w2" in k:
                assert MODEL_AXIS in entries, (k, spec)

    # ZeRO-1 must not try to stack 'data' twice on an expert table
    leaf = jax.device_put(
        np.zeros((4, 32, 64), np.float32),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(DATA_AXIS, None, None)
        ),
    )
    assert zero1_sharding(leaf, mesh) is None


def test_train_step_parity_across_meshes(tmp_path):
    """MoE training is numerically identical on 1-device, dp8 (expert
    parallelism: 2 experts per chip + dispatch all-to-alls), and
    dp4xtp2 (EP composed with TP on the FFN inner dim)."""
    batch = _make_batch()
    cpus = jax.devices("cpu")
    meshes = {
        "single": make_mesh(cpus[:1], model=1),
        "dp8": make_mesh(cpus[:8], model=1),
        "dp4_tp2": make_mesh(cpus[:8], model=2),
    }
    results = {}
    for tag, mesh in meshes.items():
        solver, model = _moe_solver(mesh, tmp_path, tag)
        arrays = shard_batch(array_fields(batch), mesh)
        rng = jax.random.PRNGKey(7)
        params, opt_state = model.params, solver.opt_state
        for _ in range(2):
            params, opt_state, loss, losses = solver._train_step(
                params, opt_state, arrays, rng
            )
        assert "moe_aux_loss" in losses and np.isfinite(float(losses["moe_aux_loss"]))
        results[tag] = (jax.device_get(params), float(loss))
    ref_params, ref_loss = results["single"]
    for tag in ("dp8", "dp4_tp2"):
        params, loss = results[tag]
        assert np.isclose(loss, ref_loss, rtol=2e-4), (tag, loss, ref_loss)
        _params_allclose(params, ref_params, 2e-3, 2e-5, tag)


def test_decode_path_ignores_moe_collection(tmp_path):
    """Beam decode never requests the 'moe' collection — the router aux
    sow must be a silent no-op outside training."""
    cfg = _moe_model_config()
    model = get_model_class(cfg.type).create_model(cfg)
    feats = np.random.RandomState(0).randn(2, 24, 20).astype(np.float32)
    lens = np.asarray([24, 18], np.int32)
    hyps, hyp_lens, scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6
    )
    assert np.asarray(hyps).shape[0] == 2


def test_moe_rejects_pipeline_and_streaming():
    cfg = _moe_model_config()
    d = cfg.to_dict()
    d["encoder"]["pipeline"] = True
    with pytest.raises(Exception, match="pipeline"):
        get_model_class(cfg.type).create_model(Config(d))
    d["encoder"]["pipeline"] = False
    d["encoder"]["streaming"] = {"chunk": 4, "left_chunks": 2}
    with pytest.raises(Exception, match="streaming"):
        get_model_class(cfg.type).create_model(Config(d))


# ------------------------------------------------------------- glu experts

def _expert_glu_ffn(params, e, v):
    """Per-token oracle for one glu expert: (v·w1+b1)*sigmoid(v·wg+bg)·w2."""
    w1 = np.asarray(params["w1"], np.float64)
    b1 = np.asarray(params["b1"], np.float64)
    wg = np.asarray(params["w_gate"], np.float64)
    bg = np.asarray(params["b_gate"], np.float64)
    w2 = np.asarray(params["w2"], np.float64)
    b2 = np.asarray(params["b2"], np.float64)
    a = v @ w1[e] + b1[e]
    g = v @ wg[e] + bg[e]
    return (a * (1.0 / (1.0 + np.exp(-g)))) @ w2[e] + b2[e]


def _init_moe_glu(d=16, f=32, experts=4, top_k=2, cf=8.0, t=12, b=2, seed=0):
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (b, t, d))
    mod = MoEFeedForward(d, f, num_experts=experts, top_k=top_k,
                         capacity_factor=cf, activation="glu")
    params = mod.init({"params": rng}, x)["params"]
    return mod, params, x


def test_glu_single_expert_equals_dense_glu_ffn():
    """One glu expert with top_k=1 IS the dense glu FeedForward
    (layers.py): pack [w1|w_gate] into linear1's width-2F kernel and
    compare outputs exactly (reference glu semantics:
    src/third_party/transformer.py:279-281,400-408)."""
    from openasr_tpu.models.layers import FeedForward

    mod, params, x = _init_moe_glu(experts=1, top_k=1)
    y, _ = _apply(mod, params, x)

    dense = FeedForward(16, 32, activation="glu")
    k1 = np.concatenate(
        [np.asarray(params["w1"][0]), np.asarray(params["w_gate"][0])], axis=1
    )
    bias1 = np.concatenate(
        [np.asarray(params["b1"][0]), np.asarray(params["b_gate"][0])]
    )
    dense_params = {
        "linear1": {"kernel": jnp.asarray(k1), "bias": jnp.asarray(bias1)},
        "linear2": {"kernel": jnp.asarray(params["w2"][0]),
                    "bias": jnp.asarray(params["b2"][0])},
    }
    ref = dense.apply({"params": dense_params}, x)
    np.testing.assert_allclose(y, np.asarray(ref), atol=1e-5)


def test_glu_topk_matches_per_token_oracle():
    mod, params, x = _init_moe_glu(experts=4, top_k=2, cf=8.0)
    y, aux = _apply(mod, params, x)
    _, tg, ti = _router(params, x, 2)
    B, T, _ = x.shape
    ref = np.zeros_like(y, np.float64)
    for b in range(B):
        for t in range(T):
            for j in range(2):
                ref[b, t] += tg[b, t, j] * _expert_glu_ffn(
                    params, int(ti[b, t, j]), np.asarray(x[b, t], np.float64)
                )
    np.testing.assert_allclose(y, ref, atol=1e-5)
    assert np.isfinite(aux) and aux > 0


def test_moe_unknown_activation_raises():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4, 8))
    mod = MoEFeedForward(8, 16, num_experts=2, activation="swish")
    with pytest.raises(ValueError, match="activation"):
        mod.init({"params": rng}, x)


def _moe_glu_model_config(vocab=8):
    cfg = _moe_model_config(vocab)
    d = cfg.to_dict()
    d["encoder"]["activation"] = "glu"
    return Config(d)


def test_glu_train_step_parity_single_vs_dp4tp2(tmp_path):
    """The flagship activation (glu) trains identically on one device and
    a dp4xtp2 mesh with expert tables sharded — the composition the
    driver's MoE/EP dryrun section runs (__graft_entry__.py)."""
    batch = _make_batch()
    cpus = jax.devices("cpu")
    results = {}
    for tag, mesh in (
        ("single", make_mesh(cpus[:1], model=1)),
        ("dp4_tp2", make_mesh(cpus[:8], model=2)),
    ):
        cfg = _moe_glu_model_config()
        model = get_model_class(cfg.type).create_model(cfg)
        training = Config({
            "num_epoch": 1, "exp_dir": str(tmp_path / f"glu_{tag}"),
            "print_inteval": 1000, "accumulate_grad_batch": 1,
            "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
            "label_smooth": 0.1, "lambda_ctc": 0.5,
            "lr_scheduler": {"type": "warmup_transformer",
                             "warmup_step": 20, "d_model": 32},
        })
        solver = get_solver_class(cfg.type)(model, training, [], [], mesh=mesh)
        arrays = shard_batch(array_fields(batch), mesh)
        params, opt_state, loss, losses = solver._train_step(
            model.params, solver.opt_state, arrays, jax.random.PRNGKey(3)
        )
        assert "moe_aux_loss" in losses
        results[tag] = (jax.device_get(params), float(loss))
    ref_params, ref_loss = results["single"]
    params, loss = results["dp4_tp2"]
    assert np.isclose(loss, ref_loss, rtol=2e-4), (loss, ref_loss)
    _params_allclose(params, ref_params, 2e-3, 2e-5, "glu_dp4_tp2")


# ------------------------------------------------- validation & rejection

def test_moe_rejected_for_incapable_families():
    """Families whose loss paths never collect the router aux reject a
    moe section at construction (Framework.__init__) — no model type can
    run a router whose balance loss is silently dropped."""
    moe = {"num_experts": 4, "top_k": 2}

    gru = Config({
        "type": "gru_ctc", "add_blk": True,
        "signal": {"d_model": 16},
        "encoder": {"type": "GRU", "d_input": 16, "d_model": 16,
                    "n_layers": 1, "moe": moe},
        "decoder": {"type": "FC_Decoder", "vocab_size": 8, "d_model": 16},
    })
    with pytest.raises(ValueError, match="moe"):
        get_model_class("gru_ctc").create_model(gru)

    gan = Config({
        "type": "gan_phone2char",
        "G": {"encoder": {"vocab_size": 16, "d_model": 16, "moe": moe},
              "decoder": {"vocab_size": 8, "d_model": 16, "nhead": 2,
                          "num_layers": 1, "dim_feedforward": 32,
                          "activation": "relu", "dropout_rate": 0.0}},
        "D": {"encoder": {"d_input": 8, "d_model": 16, "layer_num": 1}},
    })
    with pytest.raises(ValueError, match="moe"):
        get_model_class("gan_phone2char").create_model(gan)

    embed = Config({
        "type": "Embed_Decoder",
        "encoder": {"vocab_size": 16, "d_model": 16, "moe": moe},
        "decoder": {"vocab_size": 8, "d_model": 16, "nhead": 2,
                    "num_layers": 1, "encoder_dim": 16,
                    "dim_feedforward": 32, "activation": "relu",
                    "dropout_rate": 0.0},
    })
    with pytest.raises(ValueError, match="moe"):
        get_model_class("Embed_Decoder").create_model(embed)


def test_moe_in_wrong_section_rejected():
    """A moe block in a section the family never reads (e.g. decoder.moe
    on conv-ctc-transformer) fails loudly instead of being ignored."""
    cfg = model_config(8)
    d = cfg.to_dict()
    d["decoder"]["moe"] = {"num_experts": 4}
    with pytest.raises(ValueError, match="section"):
        get_model_class(cfg.type).create_model(Config(d))


def test_validate_config_rejects_bad_moe():
    from openasr_tpu.config import validate_config

    def model_with(moe=None, activation="relu", mtype="conv-ctc-transformer"):
        return {
            "model": {
                "type": mtype,
                "encoder": {"input_dim": 20, "d_model": 32, "nhead": 2,
                            "dim_feedforward": 64, "num_layers": 2,
                            "activation": activation, "moe": moe},
            }
        }

    good = {"num_experts": 4, "top_k": 2, "every": 2}
    validate_config(model_with(good))  # sanity: flagship shape passes

    # explicit num_experts: 0 is the documented "disabled" spelling — the
    # builders run dense for it, so config load accepts it (with a warning)
    with pytest.warns(UserWarning, match="disables MoE"):
        validate_config(model_with({"num_experts": 0}))
    # ...but a moe section that never says how many experts is malformed
    with pytest.raises(ValueError, match="num_experts"):
        validate_config(model_with({"top_k": 2}))
    with pytest.raises(ValueError, match="every"):
        validate_config(model_with({"num_experts": 4, "every": 0}))
    with pytest.raises(ValueError, match="num_layers"):
        validate_config(model_with({"num_experts": 4, "every": 3}))
    with pytest.raises(ValueError, match="top_k"):
        validate_config(model_with({"num_experts": 4, "top_k": 0}))
    with pytest.raises(ValueError, match="capacity_factor"):
        validate_config(model_with({"num_experts": 4,
                                    "capacity_factor": -1.0}))
    with pytest.raises(ValueError, match="activation"):
        validate_config(model_with(good, activation="swish"))
    with pytest.raises(ValueError, match="not supported"):
        validate_config(model_with(good, mtype="gru_ctc"))
    # glu (the flagship activation) is supported
    validate_config(model_with(good, activation="glu"))


def test_from_config_guards_bad_every():
    from openasr_tpu.models.encoder import TransformerEncoder

    base = {"input_dim": 20, "d_model": 32, "nhead": 2,
            "dim_feedforward": 64, "num_layers": 2, "activation": "relu"}
    with pytest.raises(ValueError, match="moe"):
        TransformerEncoder.from_config(
            Config(dict(base, moe={"num_experts": 4, "every": 0}))
        )
    with pytest.raises(ValueError, match="zero MoE layers"):
        TransformerEncoder.from_config(
            Config(dict(base, moe={"num_experts": 4, "every": 5}))
        )


# --------------------------------------------- aux collection per family

def test_cif_families_collect_moe_aux():
    """CIF/ctc_cif and CIF_FC/CIF_MIX losses carry the router aux when
    encoder.moe is on (round-3 gap: their loss() used plain apply and
    silently dropped the sow)."""
    moe = {"num_experts": 4, "top_k": 2, "capacity_factor": 2.0, "every": 1}
    enc = {"type": "Transformer", "sub": {"type": "ConvV2", "layer_num": 1},
           "input_dim": 20, "d_model": 32, "nhead": 2,
           "dim_feedforward": 64, "activation": "glu", "num_layers": 1,
           "dropout_rate": 0.0, "moe": moe}

    cif_cfg = Config({
        "type": "ctc_cif", "add_eos": True, "add_blk": True,
        "signal": {"feature_type": "offline"},
        "encoder": enc,
        "assigner": {"d_model": 32, "n_layers": 2, "w_context": 3,
                     "dropout": 0.0},
        "decoder": {"type": "CIF_Decoder", "vocab_size": 8, "d_model": 32,
                    "nhead": 2, "num_layers": 1, "encoder_dim": 32,
                    "dim_feedforward": 64, "activation": "relu",
                    "dropout_rate": 0.0},
    })
    model = get_model_class("ctc_cif").create_model(cif_cfg)
    batch = _make_batch()
    losses = model.loss(model.params, batch, {}, train=False)
    assert "moe_aux_loss" in losses
    assert np.isfinite(float(losses["moe_aux_loss"]))

    fc_cfg = Config({
        "type": "CIF_FC", "add_eos": True, "add_blk": True,
        "signal": {"feature_type": "offline"},
        "encoder": enc,
        "assigner": {"d_model": 32, "n_layers": 2, "w_context": 3,
                     "dropout": 0.0},
        "decoder": {"vocab_size": 8},
    })
    fc_model = get_model_class("CIF_FC").create_model(fc_cfg)
    rs = np.random.RandomState(0)
    fc_batch = {
        "feats": rs.randn(2, 48, 20).astype(np.float32),
        "feat_lengths": np.asarray([48, 40], np.int32),
        "phones": rs.randint(3, 7, (2, 6)).astype(np.int32),
        "phone_lengths": np.asarray([6, 4], np.int32),
    }
    fc_losses = fc_model.loss(fc_model.params, fc_batch, {}, train=False)
    assert "moe_aux_loss" in fc_losses
    assert np.isfinite(float(fc_losses["moe_aux_loss"]))


def test_embed_decoder_ctc_collects_moe_aux():
    """Embed_Decoder_CTC's transformer stack lives under the 'decoder'
    config section (reference naming) — moe there is honored and its aux
    collected."""
    cfg = Config({
        "type": "Embed_Decoder_CTC",
        "encoder": {"vocab_size": 16, "d_model": 32},
        "decoder": {"vocab_size": 8, "d_model": 32, "nhead": 2,
                    "num_layers": 1, "dim_feedforward": 64,
                    "activation": "glu", "dropout_rate": 0.0,
                    "moe": {"num_experts": 4, "top_k": 2, "every": 1}},
    })
    model = get_model_class("Embed_Decoder_CTC").create_model(cfg)
    rs = np.random.RandomState(1)
    paddings = np.zeros((2, 5), np.float32)
    paddings[:, 4:] = 1.0
    batch = {
        "phones": rs.randint(3, 15, (2, 7)).astype(np.int32),
        "phone_lengths": np.asarray([7, 5], np.int32),
        "labels": rs.randint(3, 7, (2, 5)).astype(np.int32),
        "paddings": paddings,
    }
    losses = model.loss(model.params, batch, {}, train=False)
    assert "moe_aux_loss" in losses
    assert np.isfinite(float(losses["moe_aux_loss"]))


# --------------------------------------------- composition with machinery

def test_moe_checkpoint_roundtrip_and_averaging(tmp_path):
    """Expert tables (incl. glu's w_gate/b_gate) survive package ->
    save -> load -> restore and avg_last_ckpts."""
    from openasr_tpu.utils.checkpoint import (
        average_last_ckpts,
        load_package,
        save_package,
    )

    cfg = _moe_glu_model_config()
    model = get_model_class(cfg.type).create_model(cfg)
    pkg = model.package()

    exp = tmp_path / "exp"
    exp.mkdir()
    save_package(pkg, str(exp / "ep-01.pkg"))
    # a second "epoch": perturb every leaf by +1
    pkg2 = jax.tree_util.tree_map(lambda a: np.asarray(a) + 1.0, pkg["components"])
    save_package(dict(pkg, components=pkg2), str(exp / "ep-02.pkg"))

    out = average_last_ckpts(str(exp), 2, str(exp / "avg.pkg"))
    avg = load_package(out)

    flat_model = {
        jax.tree_util.keystr(p): np.asarray(l)
        for p, l in jax.tree_util.tree_flatten_with_path(pkg["components"])[0]
    }
    flat_avg = {
        jax.tree_util.keystr(p): np.asarray(l)
        for p, l in jax.tree_util.tree_flatten_with_path(avg["components"])[0]
    }
    moe_keys = [k for k in flat_model if "moe_ffn" in k]
    assert any("w_gate" in k for k in moe_keys), "glu gate table missing"
    for k in moe_keys:
        np.testing.assert_allclose(
            flat_avg[k], flat_model[k] + 0.5, atol=1e-6, err_msg=k
        )

    # restore: the averaged package loads back into a fresh model
    fresh = get_model_class(cfg.type).create_model(cfg)
    fresh.restore(avg)
    for p, l in jax.tree_util.tree_flatten_with_path(fresh.params)[0]:
        k = jax.tree_util.keystr(p)
        if "moe_ffn" in k:
            np.testing.assert_allclose(
                np.asarray(l), flat_avg[k], atol=1e-6, err_msg=k
            )


def test_moe_with_flash_attention_path(tmp_path):
    """MoE layers compose with the Pallas flash-attention path (interpret
    mode on CPU) under a dp4xtp2 mesh — the real-pod hot path."""
    import os

    from openasr_tpu.kernels import set_flash_attention

    batch = _make_batch()
    cpus = jax.devices("cpu")
    mesh = make_mesh(cpus[:8], model=2)
    set_flash_attention(True)
    os.environ["OPENASR_FLASH_MIN_LEN"] = "0"
    try:
        solver, model = _moe_solver(mesh, tmp_path, "flash")
        arrays = shard_batch(array_fields(batch), mesh)
        params, opt_state, loss, losses = solver._train_step(
            model.params, solver.opt_state, arrays, jax.random.PRNGKey(11)
        )
        assert np.isfinite(float(loss))
        assert "moe_aux_loss" in losses
    finally:
        set_flash_attention(False)
        os.environ.pop("OPENASR_FLASH_MIN_LEN", None)


def test_ep_dispatch_all_to_all_no_table_gather():
    """The EP dispatch lowers to all-to-alls and NEVER all-gathers an
    expert weight table on a dp>1 mesh (the memory blow-up expert
    parallelism exists to avoid).  The staged token-side pin in
    shard_experts (parallel/mesh.py) forces GSPMD's cost model off the
    replicate-the-tokens strategy it otherwise picks at test sizes."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from openasr_tpu.parallel.mesh import expert_parallel

    cpus = jax.devices("cpu")
    mesh = make_mesh(cpus[:8], model=1)  # dp8: 1 expert per chip
    d, f = 16, 32
    mod = MoEFeedForward(d, f, num_experts=8, top_k=2, capacity_factor=2.0,
                         activation="glu")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 12, d))
    params = mod.init({"params": rng}, x)["params"]

    def place(name, leaf):
        spec = (
            P() if leaf.ndim <= 1 or name == "router"
            else P(DATA_AXIS, *([None] * (leaf.ndim - 1)))
        )
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    placed = {
        k: (
            {kk: place("router", vv) for kk, vv in v.items()}
            if k == "router"
            else place(k, v)
        )
        for k, v in params.items()
    }
    xp = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None, None)))

    def loss_fn(p, xx):
        y, _ = mod.apply({"params": p}, xx, True, None, mutable=["moe"])
        return jnp.sum(y * y)

    g = jax.jit(jax.grad(loss_fn))
    with expert_parallel(mesh):
        txt = g.lower(placed, xp).compile().as_text()

    assert "all-to-all" in txt, "EP dispatch produced no all-to-alls"

    # expert tables: global [8,16,32]/[8,32,16]/[8,32]/[8,16]; a gather
    # of a table (from its per-partition [1,...] shard) would produce
    # exactly these global shapes with 3 (or 2) dims led by 8=E
    table_shapes = {"[8,16,32]", "[8,32,16]", "[8,32]", "[8,16]"}
    for line in txt.splitlines():
        if "all-gather(" not in line:
            continue
        shape = line.split("= ", 1)[-1].split(" ", 1)[0]  # e.g. f32[8,12,16]{...}
        dims = shape.split("[", 1)[-1].split("]", 1)[0]
        assert f"[{dims}]" not in table_shapes, (
            f"expert table all-gathered: {line[:160]}"
        )


# ------------------------------------------------- expert-choice routing

def _init_moe_ec(d=16, f=32, experts=4, cf=8.0, t=12, b=2, seed=0,
                 activation="relu"):
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (b, t, d))
    mod = MoEFeedForward(d, f, num_experts=experts, top_k=2,
                         capacity_factor=cf, activation=activation,
                         router_type="expert_choice")
    params = mod.init({"params": rng}, x)["params"]
    return mod, params, x


def _apply_ec(mod, params, x, pad_mask=None):
    # expert_choice sows nothing; plain apply is the whole story
    y = mod.apply({"params": params}, x, True, pad_mask)
    return np.asarray(y)


def test_expert_choice_matches_per_token_oracle():
    """Each expert processes exactly its C highest-prob tokens per row;
    a token's output is the sum of (unnormalized prob) * FFN_e over
    every expert that picked it."""
    b, t, experts, cf = 2, 8, 4, 1.0
    mod, params, x = _init_moe_ec(experts=experts, cf=cf, t=t, b=b)
    # C = ceil(T*k*cf/E) = ceil(8*2*1/4) = 4
    C = 4
    y = _apply_ec(mod, params, x)
    g, _, _ = _router(params, x, 1)  # g: full softmax [B, T, E]
    ref = np.zeros((b, t, 16), np.float64)
    for bb in range(b):
        for e in range(experts):
            order = np.argsort(-g[bb, :, e], kind="stable")[:C]
            for tok in order:
                ref[bb, tok] += g[bb, tok, e] * _expert_ffn(
                    params, e, np.asarray(x[bb, tok], np.float64)
                )
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_expert_choice_perfect_balance():
    """With T*E scores and capacity C, every expert emits exactly C
    nonzero combine slots per row — balance by construction, no aux."""
    mod, params, x = _init_moe_ec(experts=4, cf=1.0, t=8, b=2)
    y, coll = mod.apply({"params": params}, x, True, None, mutable=["moe"])
    assert not jax.tree_util.tree_leaves(coll.get("moe", {})), (
        "expert_choice must not sow a balance auxiliary"
    )
    # rig the router so all mass points at expert 0: balance unchanged
    p = _rig_router(params)
    y2 = _apply_ec(mod, p, x)
    assert np.isfinite(np.asarray(y2)).all()


def test_expert_choice_never_picks_padding():
    """Masked tokens lose to every valid token in each expert's top-C and
    contribute/receive nothing."""
    b, t = 1, 6
    mod, params, x = _init_moe_ec(experts=2, cf=0.5, t=t, b=b)
    # C = ceil(6*2*0.5/2) = 3 < number of valid tokens (4)
    pad_mask = jnp.asarray([[1, 0, 1, 1, 0, 1]], jnp.float32)
    y = _apply_ec(mod, params, x, pad_mask)
    np.testing.assert_allclose(y[0, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[0, 4], 0.0, atol=1e-6)
    # valid tokens: each expert picked 3 of the 4, all from valid set
    g, _, _ = _router(params, x, 1)
    for e in range(2):
        masked = np.where(np.asarray(pad_mask[0]) > 0, g[0, :, e], -1.0)
        picked = set(np.argsort(-masked, kind="stable")[:3])
        assert picked <= {0, 2, 3, 5}


def test_expert_choice_glu_model_trains(tmp_path):
    """encoder.moe.router: expert_choice trains under dp4xtp2 with glu
    experts; the loss dict's moe_aux_loss is exactly 0 (nothing sown)."""
    cfg = _moe_glu_model_config()
    d = cfg.to_dict()
    d["encoder"]["moe"]["router"] = "expert_choice"
    cfg = Config(d)
    cpus = jax.devices("cpu")
    mesh = make_mesh(cpus[:8], model=2)
    model = get_model_class(cfg.type).create_model(cfg)
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / "ec"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1, "lambda_ctc": 0.5,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 32},
    })
    solver = get_solver_class(cfg.type)(model, training, [], [], mesh=mesh)
    arrays = shard_batch(array_fields(_make_batch()), mesh)
    _, _, loss, losses = solver._train_step(
        model.params, solver.opt_state, arrays, jax.random.PRNGKey(9)
    )
    assert np.isfinite(float(loss))
    assert float(losses["moe_aux_loss"]) == 0.0


def test_unknown_router_rejected():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4, 8))
    mod = MoEFeedForward(8, 16, num_experts=2, router_type="soft")
    with pytest.raises(ValueError, match="router"):
        mod.init({"params": rng}, x)

    from openasr_tpu.config import validate_config

    with pytest.raises(ValueError, match="router"):
        validate_config({
            "model": {
                "type": "conv-ctc-transformer",
                "encoder": {"input_dim": 20, "d_model": 32, "nhead": 2,
                            "dim_feedforward": 64, "num_layers": 2,
                            "activation": "glu",
                            "moe": {"num_experts": 4, "router": "soft"}},
            }
        })


def test_gan_generator_decoder_moe_rejected():
    """Review finding (round 4): the GAN generator IS an EmbedDecoderCTC
    module — G.decoder builds a TransformerEncoder, so moe there would
    create routers whose aux no GAN loss collects.  Both guards fire."""
    from openasr_tpu.config import validate_config

    gan = {
        "type": "gan_phone2char",
        "G": {"encoder": {"vocab_size": 16, "d_model": 16},
              "decoder": {"vocab_size": 8, "d_model": 16, "nhead": 2,
                          "num_layers": 1, "dim_feedforward": 32,
                          "activation": "relu", "dropout_rate": 0.0,
                          "moe": {"num_experts": 4, "top_k": 2}}},
        "D": {"encoder": {"d_input": 8, "d_model": 16, "layer_num": 1}},
    }
    with pytest.raises(ValueError, match="moe"):
        get_model_class("gan_phone2char").create_model(Config(gan))
    with pytest.raises(ValueError, match="not supported"):
        validate_config({"model": gan})


def test_moe_typo_warns_in_decoder_section(caplog):
    """model.decoder.moe shares the encoder.moe schema: a typo inside it
    gets the same did-you-mean warning as under encoder.moe."""
    import logging

    from openasr_tpu.config import validate_config

    cfg = {
        "model": {
            "type": "Embed_Decoder_CTC",
            "encoder": {"vocab_size": 16, "d_model": 32},
            "decoder": {"vocab_size": 8, "d_model": 32, "nhead": 2,
                        "num_layers": 1, "dim_feedforward": 64,
                        "activation": "glu", "dropout_rate": 0.0,
                        "moe": {"num_experts": 4, "every": 1, "topk": 4}},
        }
    }
    with caplog.at_level(logging.WARNING):
        unknown = validate_config(cfg)
    assert "model.decoder.moe.topk" in unknown
    assert any("top_k" in r.message for r in caplog.records)
