"""skip_nonfinite_grads: a step with inf/nan gradients must be rejected —
params, moments, and the bias-correction count untouched — instead of
nan-poisoning the run the way the reference's torch Adam would
(reference src/solvers/transformer.py:56-68 has no guard; deliberate
deviation documented in docs/MIGRATION.md).  Covers the fused
clip+Adam transform (the solver default) and the stock-optax fallback
wrap (optax.apply_if_finite), plus the off switch for exact reference
blow-up semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openasr_tpu.ops.fused_adam import FusedClipAdamState, fused_clip_adam


def make_tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "enc": {"w": jnp.asarray(rng.randn(8, 16).astype(np.float32))},
        "dec": {"b": jnp.asarray(rng.randn(16).astype(np.float32))},
    }


def lr_fn(count):
    return 1e-2 * jnp.ones_like(count, jnp.float32)


def finite_grads(params, k=1.0):
    return jax.tree_util.tree_map(lambda p: jnp.sin(p) * k, params)


def poison(grads, value):
    g = jax.tree_util.tree_map(lambda x: x, grads)
    g["enc"]["w"] = g["enc"]["w"].at[0, 0].set(value)
    return g


@pytest.mark.parametrize("bad", [jnp.inf, -jnp.inf, jnp.nan])
@pytest.mark.parametrize("max_norm", [5.0, 0.0])
def test_fused_rejects_nonfinite_step(bad, max_norm):
    params = make_tree()
    tx = fused_clip_adam(lr_fn, max_norm=max_norm, skip_nonfinite=True)
    state = tx.init(params)

    # finite step applies normally
    u, state = tx.update(finite_grads(params), state, params)
    params = optax.apply_updates(params, u)
    assert int(state.count) == 1 and int(state.notfinite) == 0
    p_before = jax.tree_util.tree_map(np.asarray, params)
    mu_before = jax.tree_util.tree_map(np.asarray, state.mu)
    nu_before = jax.tree_util.tree_map(np.asarray, state.nu)

    # poisoned step is rejected wholesale
    u, state = tx.update(poison(finite_grads(params), bad), state, params)
    params = optax.apply_updates(params, u)
    assert int(state.count) == 1, "bias-correction count must not advance"
    assert int(state.notfinite) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(p_before),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(a, b)
    for tree_a, tree_b in ((mu_before, state.mu), (nu_before, state.nu)):
        for a, b in zip(
            jax.tree_util.tree_leaves(tree_a),
            jax.tree_util.tree_leaves(tree_b),
        ):
            np.testing.assert_array_equal(a, b)

    # and recovery: the next finite step moves the params again
    u, state = tx.update(finite_grads(params, 2.0), state, params)
    moved = optax.apply_updates(params, u)
    assert int(state.count) == 2 and int(state.notfinite) == 1
    deltas = [
        float(np.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(moved),
        )
    ]
    assert max(deltas) > 0


def test_fused_skip_off_preserves_reference_blowup():
    """skip_nonfinite=False keeps exact reference semantics: nan grads
    poison the parameters (the parity tests vs the optax chain rely on
    this path being untouched)."""
    params = make_tree()
    tx = fused_clip_adam(lr_fn, max_norm=5.0, skip_nonfinite=False)
    state = tx.init(params)
    u, state = tx.update(poison(finite_grads(params), jnp.nan), state, params)
    params = optax.apply_updates(params, u)
    assert not np.isfinite(np.asarray(params["enc"]["w"])).all()


def test_fused_matches_chain_when_all_finite():
    """With finite grads, skip_nonfinite must not perturb the update math."""
    params = make_tree(1)
    tx_ref = fused_clip_adam(lr_fn, max_norm=5.0, skip_nonfinite=False)
    tx_skip = fused_clip_adam(lr_fn, max_norm=5.0, skip_nonfinite=True)
    s_ref, s_skip = tx_ref.init(params), tx_skip.init(params)
    p_ref = p_skip = params
    for step in range(3):
        g = finite_grads(p_ref, 1.0 + step)
        u, s_ref = tx_ref.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        g = finite_grads(p_skip, 1.0 + step)
        u, s_skip = tx_skip.update(g, s_skip, p_skip)
        p_skip = optax.apply_updates(p_skip, u)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_skip)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_solver_unfused_path_wrapped_with_apply_if_finite():
    """The stock-optax fallback (fused_adam: false) gets the same
    reject-the-step semantics via optax.apply_if_finite."""
    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class
    from openasr_tpu.parallel import make_mesh
    from openasr_tpu.solvers import Solver

    cfg = Config({
        "type": "conv_ctc",
        "add_blk": True,
        "signal": {"feature_type": "offline", "sample_rate": 16000},
        "encoder": {
            "type": "Transformer", "sub": {"type": "ConvV2", "layer_num": 1},
            "input_dim": 8, "d_model": 16, "nhead": 2,
            "dim_feedforward": 32, "activation": "relu", "num_layers": 1,
            "dropout_rate": 0.0,
        },
        "decoder": {"type": "CTC_Decoder", "vocab_size": 6, "d_model": 16},
    })
    model = get_model_class("conv_ctc").create_model(cfg)
    mesh = make_mesh(jax.devices("cpu")[:1])

    class _Loader:  # iter_one_epoch is not driven in this test
        def __len__(self):
            return 0

    training = Config({
        "num_epoch": 1, "exp_dir": "/tmp/openasr_nonfinite_test",
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "fused_adam": False,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 10,
                         "d_model": 16},
    })
    solver = Solver.__new__(Solver)
    # drive only the optimizer construction, not the full Solver setup
    solver.model = model
    solver.mesh = mesh
    solver.init_lr = 1e-3
    solver.grad_max_norm = 5.0
    from openasr_tpu.ops.schedules import get_schedule
    solver.schedule = get_schedule(training["lr_scheduler"])
    tx = solver._make_optimizer(training)
    state = tx.init(model.params)
    assert any(
        jax.tree_util.keystr(p).endswith("total_notfinite")
        for p, _ in jax.tree_util.tree_flatten_with_path(state)[0]
    ), "unfused path must be wrapped in optax.apply_if_finite"

    grads = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan), model.params
    )
    u, state2 = tx.update(grads, state, model.params)
    new_params = optax.apply_updates(model.params, u)
    for a, b in zip(
        jax.tree_util.tree_leaves(model.params),
        jax.tree_util.tree_leaves(new_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_state_without_notfinite_field():
    """A FusedClipAdamState minted before the notfinite field existed
    (e.g. reconstructed from an old checkpoint tree) must still update."""
    params = make_tree(2)
    tx = fused_clip_adam(lr_fn, max_norm=5.0, skip_nonfinite=True)
    state = tx.init(params)
    legacy = FusedClipAdamState(state.count, state.mu, state.nu, None)
    u, new_state = tx.update(finite_grads(params), legacy, params)
    assert int(new_state.count) == 1
    assert int(new_state.notfinite) == 0
