"""fused_clip_adam must match optax.chain(clip_by_global_norm, adam) exactly.

The solver's default optimizer is the fused transform; these tests pin its
semantics to the stock optax chain it replaces (same clip trigger, bias
correction, lr schedule count offsets, moment-dtype cast points)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openasr_tpu.ops.fused_adam import fused_clip_adam


def make_tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "enc": {
            "w": jnp.asarray(rng.randn(16, 32).astype(np.float32)),
            "b": jnp.asarray(rng.randn(32).astype(np.float32)),
        },
        "dec": {"w": jnp.asarray(rng.randn(32, 8).astype(np.float32))},
    }


def lr_fn(count):
    return 1e-3 * jnp.minimum(1.0, (count + 1) / 10.0)


@pytest.mark.parametrize("max_norm", [0.0, 50.0, 0.1])
def test_fused_matches_optax_chain(max_norm):
    params = make_tree(0)
    chain = [optax.clip_by_global_norm(max_norm)] if max_norm > 0 else []
    chain.append(optax.adam(lr_fn, b1=0.9, b2=0.999, eps=1e-8))
    ref_tx = optax.chain(*chain)
    fused_tx = fused_clip_adam(lr_fn, max_norm=max_norm)

    ref_state = ref_tx.init(params)
    fused_state = fused_tx.init(params)
    p_ref, p_fused = params, params
    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.sin(p * (step + 1)) * (10.0 if step == 2 else 1.0),
            params,
        )
        u_ref, ref_state = ref_tx.update(grads, ref_state, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_fused, fused_state = fused_tx.update(grads, fused_state, p_fused)
        p_fused = optax.apply_updates(p_fused, u_fused)
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree_util.tree_leaves_with_path(p_fused),
        ):
            np.testing.assert_allclose(
                a, b, rtol=1e-6, atol=1e-7,
                err_msg=f"step {step} leaf {jax.tree_util.keystr(ka)}",
            )


def test_fused_moment_dtypes():
    params = make_tree(1)
    tx = fused_clip_adam(
        lr_fn, max_norm=5.0, mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16
    )
    state = tx.init(params)
    assert all(
        l.dtype == jnp.bfloat16
        for l in jax.tree_util.tree_leaves(state.mu)
    )
    assert all(
        l.dtype == jnp.bfloat16
        for l in jax.tree_util.tree_leaves(state.nu)
    )
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state2 = tx.update(grads, state, params)
    assert int(state2.count) == 1
    # updates keep the grad dtype; moments stay bf16
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(updates)
    )
    assert all(
        l.dtype == jnp.bfloat16
        for l in jax.tree_util.tree_leaves(state2.mu)
    )
    # bf16 moments still track the optax-f32 trajectory closely
    ref_tx = optax.chain(
        optax.clip_by_global_norm(5.0), optax.adam(lr_fn)
    )
    ref_state = ref_tx.init(params)
    ref_updates, _ = ref_tx.update(grads, ref_state, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(updates),
        jax.tree_util.tree_leaves(ref_updates),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-8)


def test_solver_uses_fused_by_default():
    """The flagship solver's tx is the fused transform (and the opt-out
    knob restores the stock chain)."""
    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class
    from openasr_tpu.ops.fused_adam import FusedClipAdamState
    from openasr_tpu.parallel import make_mesh
    from openasr_tpu.solvers import get_solver_class

    cfg = Config({
        "type": "conv-ctc-transformer",
        "add_eos": True, "add_blk": True,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 8, "d_model": 16, "nhead": 2,
                    "dim_feedforward": 32, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 20,
                    "d_model": 16, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 16, "dim_feedforward": 32,
                    "activation": "relu", "dropout_rate": 0.0},
    })
    training = {
        "num_epoch": 1, "exp_dir": "/tmp/openasr_fused_test",
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1.0, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1, "lambda_ctc": 1.0, "lambda_qua": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 100,
                         "d_model": 16},
    }
    mesh = make_mesh(jax.devices("cpu")[:1])
    model = get_model_class(cfg.type).create_model(cfg)
    solver = get_solver_class(cfg.type)(
        model, Config(training), [], [], mesh=mesh
    )
    assert isinstance(solver.opt_state, FusedClipAdamState)

    model2 = get_model_class(cfg.type).create_model(cfg)
    solver2 = get_solver_class(cfg.type)(
        model2, Config(dict(training, fused_adam=False)), [], [], mesh=mesh
    )
    assert not isinstance(solver2.opt_state, FusedClipAdamState)


def test_legacy_state_fill_restores_pre_notfinite_checkpoints():
    """Checkpoints written before FusedClipAdamState.notfinite existed
    unpickle with notfinite=None (one pytree leaf fewer); fill_legacy_state
    zero-fills it so Solver.restore's leaf-count match and the update step
    both work."""
    from openasr_tpu.ops.fused_adam import FusedClipAdamState, fill_legacy_state

    params = make_tree(0)
    tx = fused_clip_adam(lr_fn, max_norm=1.0, skip_nonfinite=True)
    fresh = tx.init(params)
    legacy = FusedClipAdamState(fresh.count, fresh.mu, fresh.nu)
    assert legacy.notfinite is None
    assert (
        len(jax.tree_util.tree_leaves(legacy))
        == len(jax.tree_util.tree_leaves(fresh)) - 1
    )
    # wrapped in a tuple like an optax chain state: the fill must recurse
    filled = fill_legacy_state((legacy,))
    assert len(jax.tree_util.tree_leaves(filled)) == len(
        jax.tree_util.tree_leaves((fresh,))
    )
    assert int(filled[0].notfinite) == 0
    # the filled state steps (the update path has no None shim anymore)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, new_state = tx.update(grads, filled[0], params)
    assert int(new_state.notfinite) == 0 and int(new_state.count) == 1
    # a modern state passes through untouched
    again = fill_legacy_state((fresh,))
    assert again[0].notfinite is fresh.notfinite
