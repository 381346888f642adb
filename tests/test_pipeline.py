"""GPipe pipeline parallelism (parallel/pipeline.py) on the virtual
8-device CPU mesh.

Guarantees:

  1. Layout: stack/unstack round-trips the flax per-layer `layer{i}`
     param tree (checkpoints keep the reference-compatible layout).
  2. Forward parity: the pipelined stack equals the sequential layer
     loop on a (pipe=4, data=2) mesh, for M=1 (degenerate), M=8, and
     with per-stage rematerialization on.
  3. Backward parity: gradients w.r.t. every layer's params match the
     sequential stack — autodiff really does derive the reverse
     schedule through scan + ppermute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openasr_tpu.models.layers import TransformerEncoderLayer
from openasr_tpu.parallel import make_mesh
from openasr_tpu.parallel.pipeline import (
    gpipe_apply,
    stack_layer_params,
    unstack_layer_params,
)

D, NHEAD, FFN, L = 16, 2, 32, 4
B, T = 8, 12


def _layer_module():
    return TransformerEncoderLayer(D, NHEAD, FFN, 0.0, "relu")


def _make_params(seed=0):
    """Per-layer trees shaped like a real encoder's layer{i} children."""
    module = _layer_module()
    x = jnp.zeros((2, T, D))
    lengths = jnp.full((2,), T, jnp.int32)
    params = {}
    for i in range(L):
        v = module.init(
            jax.random.PRNGKey(seed + i), x, None, True, lengths, False
        )
        params[f"layer{i}"] = v["params"]
    return params


def _sequential(params, x, lengths):
    module = _layer_module()
    h = x
    for i in range(L):
        h = module.apply(
            {"params": params[f"layer{i}"]}, h, None, True, lengths, False
        )
    return h


def _layer_apply(lp, h, aux, rr):
    rngs = {"dropout": rr} if rr is not None else None
    return _layer_module().apply(
        {"params": lp}, h, None, rr is None, aux["lengths"], False, rngs=rngs
    )


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices("cpu")[:8], model=1, pipe=4)


def test_stack_unstack_roundtrip():
    params = _make_params()
    stacked, n = stack_layer_params(params)
    assert n == L
    back = unstack_layer_params(stacked, n)
    for i in range(L):
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, back[f"layer{i}"],
            params[f"layer{i}"],
        )


def test_stack_rejects_gaps():
    params = _make_params()
    del params["layer2"]
    with pytest.raises(ValueError, match="non-contiguous"):
        stack_layer_params(params)


@pytest.mark.parametrize("n_microbatch", [1, 8])
def test_gpipe_forward_parity(mesh, n_microbatch):
    params = _make_params()
    stacked, _ = stack_layer_params(params)
    rng = np.random.RandomState(3)
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = np.linspace(T // 2, T, B).astype(np.int32)

    ref = _sequential(params, jnp.asarray(x), jnp.asarray(lengths))
    got = jax.jit(
        lambda p, xx, ll: gpipe_apply(
            _layer_apply, p, xx, {"lengths": ll}, mesh, n_microbatch
        )
    )(stacked, x, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gpipe_remat_parity(mesh):
    params = _make_params(seed=7)
    stacked, _ = stack_layer_params(params)
    rng = np.random.RandomState(5)
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = np.full((B,), T, np.int32)

    ref = _sequential(params, jnp.asarray(x), jnp.asarray(lengths))
    got = jax.jit(
        lambda p, xx, ll: gpipe_apply(
            _layer_apply, p, xx, {"lengths": ll}, mesh, 4, remat=True
        )
    )(stacked, x, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------- full-model integration
#
# encoder.pipeline: true selects the stacked layer layout
# (models/encoder.py:PipelinedEncoderStack); under a pipe>1 mesh the
# solver scopes the GPipe context into its jitted steps.


def _speech_solver(mesh, tmp_path, tag, pipeline, num_layers=2):
    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class
    from openasr_tpu.solvers import get_solver_class
    from test_train_e2e import model_config

    cfg = model_config(8)
    cfg.encoder["num_layers"] = num_layers
    cfg.encoder["pipeline"] = pipeline
    model = get_model_class(cfg.type).create_model(cfg)
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / f"pp_{tag}"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1, "lambda_ctc": 0.5, "pipeline_microbatch": 4,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 32},
    })
    return get_solver_class(cfg.type)(model, training, [], [], mesh=mesh), model


def _convert_to_stacked(perlayer_model_params):
    """Per-layer encoder tree -> the stacked model's param layout."""
    enc = perlayer_model_params["encoder"]
    stacked, _ = stack_layer_params(enc)
    new_enc = {
        k: v for k, v in enc.items()
        if not (k.startswith("layer") and k[5:].isdigit())
    }
    new_enc["stack"] = {"stacked_layers": stacked}
    out = dict(perlayer_model_params)
    out["encoder"] = new_enc
    return out


def test_stacked_layout_matches_per_layer(tmp_path):
    """Same weights, both layouts, single device: identical eval losses —
    the stacked scan is the same math as the per-layer loop, and the
    layout converter maps between them."""
    from openasr_tpu.parallel import shard_batch
    from openasr_tpu.solvers import array_fields
    from test_tensor_parallel import _make_batch

    single = make_mesh(jax.devices("cpu")[:1], model=1)
    sol_a, model_a = _speech_solver(single, tmp_path, "perlayer", False)
    sol_b, model_b = _speech_solver(single, tmp_path, "stacked", True)
    model_b.params = jax.tree_util.tree_map(
        jnp.asarray, _convert_to_stacked(
            jax.tree_util.tree_map(np.asarray, model_a.params)
        )
    )
    batch = _make_batch()
    arrays = shard_batch(array_fields(batch), single)
    la = {k: float(v) for k, v in
          sol_a._eval_step(model_a.params, arrays).items()}
    lb = {k: float(v) for k, v in
          sol_b._eval_step(model_b.params, arrays).items()}
    for k in ("ce_loss", "ctc_loss"):
        assert np.isclose(la[k], lb[k], rtol=1e-5), (k, la[k], lb[k])


def test_pipeline_train_step_parity(tmp_path):
    """The stacked model trains identically on a single device
    (sequential scan) and on a pipe2 x data4 mesh (GPipe schedule +
    pipe-sharded layer params)."""
    from openasr_tpu.parallel import shard_batch
    from openasr_tpu.parallel.mesh import PIPE_AXIS
    from openasr_tpu.solvers import array_fields
    from test_tensor_parallel import _make_batch, _params_allclose

    batch = _make_batch()
    rng = jax.random.PRNGKey(13)
    cpus = jax.devices("cpu")
    out = {}
    for tag, m in (
        ("single", make_mesh(cpus[:1], model=1)),
        ("pipe2_dp4", make_mesh(cpus[:8], model=1, pipe=2)),
    ):
        solver, model = _speech_solver(m, tmp_path, f"par_{tag}", True)
        if tag == "pipe2_dp4":
            assert solver._pipe_ctx is not None
            # the stacked layer group must actually be pipe-sharded
            stacked = model.params["encoder"]["stack"]["stacked_layers"]
            leaf = jax.tree_util.tree_leaves(stacked)[0]
            assert PIPE_AXIS in tuple(leaf.sharding.spec), leaf.sharding
        arrays = shard_batch(array_fields(batch), m)
        params, opt_state = model.params, solver.opt_state
        for k in range(2):
            params, opt_state, loss, _ = solver._train_step(
                params, opt_state, arrays, jax.random.fold_in(rng, k)
            )
        out[tag] = (
            float(loss),
            jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
        )
    ref_loss, ref_params = out["single"]
    assert np.isfinite(ref_loss)
    loss, params = out["pipe2_dp4"]
    assert np.isclose(loss, ref_loss, rtol=2e-4), (loss, ref_loss)
    _params_allclose(params, ref_params, rtol=2e-3, atol=2e-5,
                     tag="pipe2_dp4")


def test_stack_pkg_tool_roundtrip(tmp_path):
    """tools/stack_encoder_pkg.py converts a saved per-layer package to
    the stacked layout (and back) with identical weights."""
    import sys

    sys.path.insert(0, "tools")
    import stack_encoder_pkg

    from openasr_tpu.utils.checkpoint import load_package, save_package

    single = make_mesh(jax.devices("cpu")[:1], model=1)
    solver, model = _speech_solver(single, tmp_path, "tool", False)
    solver.model.params = model.params
    pkg = solver.package()
    src = str(tmp_path / "perlayer.pkg")
    dst = str(tmp_path / "stacked.pkg")
    back = str(tmp_path / "back.pkg")
    save_package(jax.tree_util.tree_map(np.asarray, pkg), src)

    stack_encoder_pkg.main([src, dst])
    stacked_pkg = load_package(dst)
    enc = stacked_pkg["model"]["components"]["encoder"]
    assert "stack" in enc and "layer0" not in enc

    stack_encoder_pkg.main([dst, back, "--unstack"])
    back_pkg = load_package(back)
    orig_pkg = load_package(src)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal,
        back_pkg["model"]["components"]["encoder"],
        orig_pkg["model"]["components"]["encoder"],
    )


def test_gpipe_grad_parity(mesh):
    params = _make_params(seed=11)
    stacked, _ = stack_layer_params(params)
    rng = np.random.RandomState(9)
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = np.linspace(T // 2, T, B).astype(np.int32)
    cot = rng.randn(B, T, D).astype(np.float32)

    def loss_pipe(p):
        out = gpipe_apply(
            _layer_apply, p, x, {"lengths": lengths}, mesh, 4
        )
        return jnp.sum(out * cot)

    def loss_seq(params):
        return jnp.sum(_sequential(params, jnp.asarray(x),
                                   jnp.asarray(lengths)) * cot)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.grad(loss_seq)(params)
    g_seq_stacked, _ = stack_layer_params(g_seq)

    flat_p = jax.tree_util.tree_flatten_with_path(g_pipe)[0]
    flat_s = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(g_seq_stacked)[0]
    }
    assert flat_p
    for path, leaf in flat_p:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[key]),
            rtol=2e-4, atol=1e-5, err_msg=key,
        )
