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
