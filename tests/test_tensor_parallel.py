"""Tensor-parallel correctness on the virtual 8-device CPU mesh.

Two guarantees (SURVEY.md §4 test strategy; replaces the reference's
DataParallel path, src/train.py:132-134):

  1. `param_shardings`' name-matching rules really hit the attention /
     FFN / embedding leaves of a real model tree — a silent fallback to
     full replication (e.g. after a module rename) fails the unit test.
  2. Train/eval steps are numerically identical across 1-device,
     data=8 x model=1, and data=4 x model=2 meshes: GSPMD sharding is
     an execution detail, never a semantics change.
"""

import numpy as np
import pytest

import jax

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.parallel import make_mesh, shard_batch
from openasr_tpu.parallel.mesh import MODEL_AXIS, param_shardings
from openasr_tpu.solvers import array_fields, get_solver_class

from test_train_e2e import model_config


def _make_batch(b=8, t=48, d=20, u=6, vocab=8, seed=0):
    rng = np.random.RandomState(seed)
    paddings = np.zeros((b, u), np.float32)
    paddings[:, u - 2:] = 1.0
    return {
        "feats": rng.randn(b, t, d).astype(np.float32),
        "feat_lengths": np.linspace(t // 2, t, b).astype(np.int32),
        "ids": rng.randint(3, vocab - 1, (b, u)).astype(np.int32),
        "labels": rng.randint(3, vocab - 1, (b, u)).astype(np.int32),
        "paddings": paddings,
    }


def _make_solver(mesh, tmp_path, tag):
    cfg = model_config(8)
    model = get_model_class(cfg.type).create_model(cfg)
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / f"exp_{tag}"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1, "lambda_ctc": 0.5,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 32},
    })
    solver_cls = get_solver_class(cfg.type)
    return solver_cls(model, training, [], [], mesh=mesh), model


def _meshes():
    cpus = jax.devices("cpu")
    return {
        "single": make_mesh(cpus[:1], model=1),
        "dp8": make_mesh(cpus[:8], model=1),
        "dp4_tp2": make_mesh(cpus[:8], model=2),
    }


def test_param_shardings_assign_model_axis():
    """Guard the name-matching TP rules (parallel/mesh.py:_spec_for)
    against module renames: the attention projections, FFN linears, and
    the embedding of a real model tree must get MODEL_AXIS specs."""
    cfg = model_config(8)
    model = get_model_class(cfg.type).create_model(cfg)
    mesh = make_mesh(jax.devices("cpu")[:8], model=2)
    shardings = param_shardings(model.params, mesh)

    flat = {
        jax.tree_util.keystr(path): s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    }

    def expect_model_axis(substrings):
        hits = [k for k in flat if all(s in k for s in substrings)]
        assert hits, f"no param leaf matches {substrings}"
        for k in hits:
            assert MODEL_AXIS in tuple(flat[k]), (
                f"{k} not sharded over '{MODEL_AXIS}': {flat[k]}"
            )

    for attn in ("self_attn", "cross_attn"):
        for proj in ("q", "k", "v", "out"):
            expect_model_axis([attn, proj, "kernel"])
    expect_model_axis(["ffn", "linear1", "kernel"])
    expect_model_axis(["ffn", "linear2", "kernel"])
    expect_model_axis(["emb", "embedding"])

    # LayerNorms and the tied-output bias stay replicated
    for k, spec in flat.items():
        if "norm" in k or "out_bias" in k:
            assert MODEL_AXIS not in tuple(spec), (k, spec)


def test_eval_step_parity_across_meshes(tmp_path):
    """Same batch, same params: eval losses agree on single-device,
    pure-DP, and DP x TP meshes."""
    batch = _make_batch()
    results = {}
    for tag, mesh in _meshes().items():
        solver, model = _make_solver(mesh, tmp_path, tag)
        arrays = shard_batch(array_fields(batch), mesh)
        results[tag] = {
            k: float(v)
            for k, v in solver._eval_step(model.params, arrays).items()
        }
    ref = results["single"]
    for tag in ("dp8", "dp4_tp2"):
        for k in ("ce_loss", "ctc_loss", "n_tokens", "n_seqs"):
            assert np.isclose(results[tag][k], ref[k], rtol=2e-4), (
                tag, k, results[tag][k], ref[k]
            )


def test_train_step_parity_across_meshes(tmp_path):
    """One optimizer step produces the same loss and the same updated
    parameters on every mesh (within f32 reduction-order noise)."""
    batch = _make_batch()
    rng = jax.random.PRNGKey(7)
    out = {}
    for tag, mesh in _meshes().items():
        solver, model = _make_solver(mesh, tmp_path, tag)
        arrays = shard_batch(array_fields(batch), mesh)
        params, opt_state, loss, losses = solver._train_step(
            model.params, solver.opt_state, arrays, rng
        )
        host = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
        out[tag] = (float(loss), host)

    ref_loss, ref_params = out["single"]
    assert np.isfinite(ref_loss)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    for tag in ("dp8", "dp4_tp2"):
        loss, params = out[tag]
        assert np.isclose(loss, ref_loss, rtol=2e-4), (tag, loss, ref_loss)
        flat = dict(
            (jax.tree_util.keystr(p), leaf)
            for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        )
        for path, ref_leaf in flat_ref:
            key = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                flat[key], ref_leaf, rtol=2e-3, atol=2e-5,
                err_msg=f"{tag}:{key}",
            )


# ------------------------------------------------- beyond the flagship tree

def _cif_solver(mesh, tmp_path, tag):
    cfg = Config({
        "type": "ctc_cif", "add_eos": True, "add_blk": True,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "assigner": {"d_model": 32, "n_layers": 2, "w_context": 3,
                     "dropout": 0.0},
        "decoder": {"type": "CIF_Decoder", "vocab_size": 8, "d_model": 32,
                    "nhead": 2, "num_layers": 1, "encoder_dim": 32,
                    "dim_feedforward": 64, "activation": "relu",
                    "dropout_rate": 0.0},
    })
    model = get_model_class(cfg.type).create_model(cfg)
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / f"cif_{tag}"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1, "lambda_ctc": 0.5, "lambda_qua": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 32},
    })
    return get_solver_class(cfg.type)(model, training, [], [], mesh=mesh), model


def _params_allclose(got, ref, rtol, atol, tag):
    flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
    flat = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(got)[0]
    }
    for path, ref_leaf in flat_ref:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            flat[key], ref_leaf, rtol=rtol, atol=atol,
            err_msg=f"{tag}:{key}",
        )


def test_cif_train_step_parity_across_meshes(tmp_path):
    """The CIF tree (assigner + scan/cumsum-scatter fire + CIF decoder)
    must train identically on single-device and dp4 x tp2 meshes."""
    batch = _make_batch()
    rng = jax.random.PRNGKey(11)
    out = {}
    for tag in ("single", "dp4_tp2"):
        mesh = _meshes()[tag]
        solver, model = _cif_solver(mesh, tmp_path, tag)
        arrays = shard_batch(array_fields(batch), mesh)
        params, _, loss, _ = solver._train_step(
            model.params, solver.opt_state, arrays, rng
        )
        out[tag] = (
            float(loss),
            jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
        )
    ref_loss, ref_params = out["single"]
    assert np.isfinite(ref_loss)
    loss, params = out["dp4_tp2"]
    assert np.isclose(loss, ref_loss, rtol=2e-4), (loss, ref_loss)
    _params_allclose(params, ref_params, 2e-3, 2e-5, "dp4_tp2")


def _gru_solver(mesh, tmp_path, tag):
    cfg = Config({
        "type": "gru_ctc",
        "signal": {"d_model": 32},
        "encoder": {"d_input": 32, "d_model": 32, "n_layers": 1,
                    "dropout": 0.0},
        "decoder": {"vocab_size": 10},
    })
    model = get_model_class(cfg.type).create_model(cfg)
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / f"gru_{tag}"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.0, "lambda_ctc": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 32},
    })
    return get_solver_class(cfg.type)(model, training, [], [], mesh=mesh), model


def _wave_batch(b=8):
    rng = np.random.RandomState(3)
    n = 160 * 16
    return {
        "waves": rng.randn(b, n).astype(np.float32),
        "wave_lengths": np.full((b,), n, np.int32),
        "ids": rng.randint(1, 9, (b, 4)).astype(np.int32),
        "labels": rng.randint(1, 9, (b, 4)).astype(np.int32),
        "paddings": np.zeros((b, 4), np.float32),
    }


def test_gru_batch_stats_train_step_parity_across_meshes(tmp_path):
    """A BatchNorm (batch_stats) model — the mutable-collection train step
    with replicated running stats — must train identically on single and
    dp4 x tp2 meshes, including the updated batch_stats."""
    batch = _wave_batch()
    rng = jax.random.PRNGKey(13)
    out = {}
    for tag in ("single", "dp4_tp2"):
        mesh = _meshes()[tag]
        solver, model = _gru_solver(mesh, tmp_path, tag)
        arrays = shard_batch(array_fields(batch), mesh)
        params, _, loss, _ = solver._train_step(
            model.params, solver.opt_state, arrays, rng
        )
        out[tag] = (
            float(loss),
            jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
            jax.tree_util.tree_map(
                np.asarray, jax.device_get(solver.model.batch_stats)
            ),
        )
    ref_loss, ref_params, ref_bs = out["single"]
    assert np.isfinite(ref_loss)
    loss, params, bs = out["dp4_tp2"]
    assert np.isclose(loss, ref_loss, rtol=2e-4), (loss, ref_loss)
    _params_allclose(params, ref_params, 2e-3, 2e-5, "dp4_tp2")
    _params_allclose(bs, ref_bs, 2e-3, 2e-5, "dp4_tp2:batch_stats")


def _gan_solver(mesh, tmp_path, tag):
    cfg = Config({
        "type": "gan_phone2char",
        "G": {
            "encoder": {"vocab_size": 16, "d_model": 32},
            "decoder": {"vocab_size": 20, "d_model": 32, "nhead": 2,
                        "num_layers": 1, "dim_feedforward": 64,
                        "activation": "relu", "dropout_rate": 0.0},
        },
        "D": {"encoder": {"d_input": 20, "d_model": 32, "layer_num": 2}},
    })
    model = get_model_class(cfg.type).create_model(cfg)
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / f"gan_{tag}"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.0, "lambda_ctc": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 32},
    })
    return get_solver_class(cfg.type)(model, training, [], [], mesh=mesh), model


def _gan_batch(b=8):
    rng = np.random.RandomState(23)
    paddings = np.zeros((b, 5), np.float32)
    paddings[:, 4:] = 1.0
    return {
        "phones": rng.randint(3, 14, (b, 7)).astype(np.int32),
        "phone_lengths": np.linspace(4, 7, b).astype(np.int32),
        "labels": rng.randint(3, 19, (b, 5)).astype(np.int32),
        "paddings": paddings,
        "unpaired_phones": rng.randint(3, 14, (b, 7)).astype(np.int32),
        "unpaired_phone_lengths": np.linspace(4, 7, b).astype(np.int32),
        "unpaired_text": rng.randint(3, 19, (b, 6)).astype(np.int32),
        "unpaired_text_lengths": np.linspace(3, 6, b).astype(np.int32),
    }


def test_gan_train_step_parity_across_meshes(tmp_path):
    """The WGAN-GP tree — with a nested `jax.grad` (gradient penalty on
    interpolates, models/gan.py:loss_D) inside the outer loss — must train
    identically on single-device and dp4 x tp2 meshes.  GSPMD has to
    partition the double-grad computation; this is the one model family
    whose autodiff structure none of the other mesh tests exercise."""
    batch = _gan_batch()
    rng = jax.random.PRNGKey(29)
    out = {}
    for tag in ("single", "dp4_tp2"):
        mesh = _meshes()[tag]
        solver, model = _gan_solver(mesh, tmp_path, tag)
        arrays = shard_batch(array_fields(batch), mesh)
        params, _, loss, losses = solver._train_step(
            model.params, solver.opt_state, arrays, rng
        )
        for k in ("ctc_loss", "g_loss", "d_loss"):
            assert np.isfinite(float(losses[k])), (tag, k)
        out[tag] = (
            float(loss),
            jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
        )
    ref_loss, ref_params = out["single"]
    assert np.isfinite(ref_loss)
    loss, params = out["dp4_tp2"]
    assert np.isclose(loss, ref_loss, rtol=2e-4), (loss, ref_loss)
    _params_allclose(params, ref_params, 2e-3, 2e-5, "dp4_tp2:gan")


def test_tensor_parallel_resume(tmp_path):
    """Save under dp4 x tp2, restore into a fresh solver on the same mesh:
    opt-state shardings must match the live solver's (not collapse to the
    default device), and the next step must be parity-identical to the
    never-interrupted run."""
    mesh = _meshes()["dp4_tp2"]
    batch = _make_batch()
    rng0, rng1 = jax.random.PRNGKey(17), jax.random.PRNGKey(19)

    solver, model = _make_solver(mesh, tmp_path, "resume_a")
    arrays = shard_batch(array_fields(batch), mesh)
    params, opt_state, _, _ = solver._train_step(
        model.params, solver.opt_state, arrays, rng0
    )
    solver.opt_state = opt_state
    model.params = params
    solver.step = 1
    pkg = jax.tree_util.tree_map(np.asarray, solver.package())

    # the uninterrupted continuation
    params_cont, _, loss_cont, _ = solver._train_step(
        params, opt_state, arrays, rng1
    )
    cont = jax.tree_util.tree_map(np.asarray, jax.device_get(params_cont))

    # fresh solver + restore (the bin/train --continue-training order:
    # model.restore BEFORE solver construction, solver.restore after)
    solver2, model2 = _make_solver(mesh, tmp_path, "resume_b")
    init_shardings = [
        (l.sharding, l.ndim)
        for l in jax.tree_util.tree_leaves(solver2.opt_state)
    ]
    model2.restore(pkg["model"])
    solver2.model.params = solver2._place_params(model2.params)
    solver2.restore(pkg)
    assert solver2.step == 1

    restored = jax.tree_util.tree_leaves(solver2.opt_state)
    assert len(init_shardings) == len(restored)
    # restore must land every leaf back on the solver's intended mesh
    # shardings — not collapse to the default device
    for (sh, ndim), b in zip(init_shardings, restored):
        assert isinstance(b.sharding, jax.sharding.NamedSharding), b.sharding
        assert sh.is_equivalent_to(b.sharding, ndim), (sh, b.sharding)

    params_res, _, loss_res, _ = solver2._train_step(
        solver2.model.params, solver2.opt_state, arrays, rng1
    )
    res = jax.tree_util.tree_map(np.asarray, jax.device_get(params_res))
    assert np.isclose(float(loss_res), float(loss_cont), rtol=1e-5)
    _params_allclose(res, cont, 1e-4, 1e-6, "resumed")


def test_multihost_mesh_layout_validation():
    """Multi-host layouts the batch plan cannot serve are rejected at mesh
    construction with a clear error (not an opaque shard-shape crash):
    TP groups spanning hosts, non-divisible data axis, non-contiguous
    host blocks."""
    import numpy as np
    import pytest as _pytest

    from openasr_tpu.parallel.mesh import _validate_multihost_layout

    # single-host: anything goes
    _validate_multihost_layout(np.zeros((4, 2), np.int64))
    # 2 hosts, clean dp4 x tp2 with per-host contiguous rows
    ok = np.array([[0, 0], [0, 0], [1, 1], [1, 1]])
    _validate_multihost_layout(ok)
    # TP group spanning hosts (mesh (data=1, model=8) over 2 hosts)
    bad_tp = np.array([[0, 0, 0, 0, 1, 1, 1, 1]])
    with _pytest.raises(ValueError, match="may not span hosts"):
        _validate_multihost_layout(bad_tp)
    # data axis not divisible by process count
    bad_div = np.array([[0], [0], [1]])
    with _pytest.raises(ValueError, match="divide evenly"):
        _validate_multihost_layout(bad_div)
    # interleaved (non-contiguous) host rows
    bad_order = np.array([[0], [1], [0], [1]])
    with _pytest.raises(ValueError, match="process-contiguous"):
        _validate_multihost_layout(bad_order)


def test_beam_decode_under_data_parallel_mesh():
    """Batched beam decode sharded over a dp4 mesh must produce the exact
    hypotheses/scores of the single-device run — the pod-scale batch
    transcription path (replicated params, batch-sharded inputs, all
    control flow inside jit)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openasr_tpu.models import get_model_class
    from openasr_tpu.parallel import make_mesh
    from openasr_tpu.parallel.mesh import batch_sharding, replicated

    from test_train_e2e import model_config

    cfg = model_config(12)
    model = get_model_class(cfg.type).create_model(cfg)
    rng = np.random.RandomState(4)
    b, t, d = 8, 32, cfg.encoder["input_dim"]
    feats = rng.randn(b, t, d).astype(np.float32)
    lens = np.linspace(t // 2, t, b).astype(np.int32)

    single = model.batch_beam_decode(
        model.params, feats, lens, beam_size=3, max_decode_len=8
    )

    mesh = make_mesh(jax.devices("cpu")[:4], model=1)
    params = jax.device_put(
        model.params, jax.tree_util.tree_map(
            lambda _: replicated(mesh), model.params
        )
    )
    fs = jax.device_put(feats, batch_sharding(mesh, 3))
    ls = jax.device_put(lens, batch_sharding(mesh, 1))
    decode = jax.jit(
        lambda p, x, l: model.batch_beam_decode(
            p, x, l, beam_size=3, max_decode_len=8
        )
    )
    sharded = decode(params, fs, ls)
    # hypotheses and lengths must be IDENTICAL; scores may differ by f32
    # reduction order across the sharded layout (observed ~1e-5)
    np.testing.assert_array_equal(
        np.asarray(sharded[0]), np.asarray(single[0])
    )
    np.testing.assert_array_equal(
        np.asarray(sharded[1]), np.asarray(single[1])
    )
    np.testing.assert_allclose(
        np.asarray(sharded[2]), np.asarray(single[2]), atol=1e-4
    )


def test_wav2vec_freeze_gate_train_step_parity_across_meshes(tmp_path):
    """The wav2vec tree — raw-wave conv frontend + step-gated
    freeze_finetune_updates (an optax gate zeroing frozen components'
    updates inside the jitted step) — must train identically on single
    and dp4 x tp2 meshes, including the gate holding the frontend frozen."""
    from openasr_tpu.config import Config as _C

    cfg = _C({
        "type": "wav2vec_ctc",
        "add_blk": True,
        "signal": {"feature_type": "wave"},
        "encoder": {"d_model": 16, "nhead": 2, "num_layers": 1,
                    "dim_feedforward": 32, "conv_dim": 8,
                    "dropout_rate": 0.0,
                    "freeze_finetune_updates": 3},
        "decoder": {"vocab_size": 12},
    })
    rng = np.random.RandomState(0)
    b, n, u = 8, 3200, 4
    batch = {
        "waves": rng.randn(b, n).astype(np.float32),
        "wave_lengths": np.linspace(n // 2, n, b).astype(np.int32),
        "ids": rng.randint(1, 11, (b, u)).astype(np.int32),
        "labels": rng.randint(1, 11, (b, u)).astype(np.int32),
        "paddings": np.zeros((b, u), np.float32),
    }
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / "w2v"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.0, "lambda_ctc": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 16},
    })
    key = jax.random.PRNGKey(17)
    out = {}
    for tag in ("single", "dp4_tp2"):
        mesh = _meshes()[tag]
        model = get_model_class(cfg.type).create_model(cfg)
        solver = get_solver_class(cfg.type)(
            model, training, [], [], mesh=mesh
        )
        init = jax.tree_util.tree_map(np.asarray, jax.device_get(model.params))
        arrays = shard_batch(array_fields(batch), mesh)
        params, _, loss, _ = solver._train_step(
            model.params, solver.opt_state, arrays, key
        )
        out[tag] = (
            float(loss), init,
            jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
        )
    ref_loss, init, ref_params = out["single"]
    assert np.isfinite(ref_loss)
    # the step-gate is active (freeze_finetune_updates=3, step 1): the
    # whole encoder component must be bit-frozen on BOTH meshes
    _params_allclose(
        ref_params["encoder"], init["encoder"], 0.0, 0.0, "w2v:gate:single"
    )
    loss, init_tp, params = out["dp4_tp2"]
    _params_allclose(
        params["encoder"], init_tp["encoder"], 0.0, 0.0, "w2v:gate:dp4_tp2"
    )
    assert np.isclose(loss, ref_loss, rtol=2e-4), (loss, ref_loss)
    _params_allclose(params, ref_params, 2e-3, 2e-5, "w2v:dp4_tp2")
