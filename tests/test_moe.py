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
