"""CIF op and model-family tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.ops.cif import (
    cif,
    cif_output_lengths,
    cif_parallel,
    cif_scan,
    scale_alphas,
)


def reference_cif_numpy(hidden, alphas, threshold=0.95):
    """Direct NumPy transcription of the reference's sequential cif loop
    (Speech_Models.py:363-413) used as a golden."""
    b, t, d = hidden.shape
    integrate = np.zeros(b)
    frame = np.zeros((b, d))
    fires, frames = [], []
    for i in range(t):
        alpha = alphas[:, i]
        completion = 1.0 - integrate
        integrate = integrate + alpha
        fires.append(integrate.copy())
        fire = integrate > threshold
        integrate = np.where(fire, integrate - 1.0, integrate)
        cur = np.where(fire, completion, alpha)
        rem = alpha - cur
        frame = frame + cur[:, None] * hidden[:, i]
        frames.append(frame.copy())
        frame = np.where(fire[:, None], rem[:, None] * hidden[:, i], frame)
    fires = np.stack(fires, 1)
    frames = np.stack(frames, 1)
    out = []
    maxn = int(np.round(alphas.sum(-1)).max())
    for i in range(b):
        sel = frames[i][fires[i] > threshold]
        pad = np.zeros((maxn - len(sel), d))
        out.append(np.concatenate([sel, pad], 0) if maxn > len(sel)
                   else sel[:maxn])
    return np.stack(out, 0)


def test_cif_scan_matches_reference_loop():
    rng = np.random.RandomState(0)
    b, t, d = 3, 40, 8
    hidden = rng.randn(b, t, d).astype(np.float32)
    alphas = rng.rand(b, t).astype(np.float32) * 0.3
    # scale to integer-ish counts like training does
    tl = np.array([5, 4, 3], np.float32)
    alphas = alphas * (tl / alphas.sum(-1))[:, None]

    golden = reference_cif_numpy(hidden, alphas)
    cap = golden.shape[1]
    got = np.asarray(cif(jnp.asarray(hidden), jnp.asarray(alphas), cap))
    np.testing.assert_allclose(got, golden[:, :cap], rtol=1e-4, atol=1e-5)


def test_cif_parallel_matches_scan():
    """The closed-form (cummin + one-hot matmul) CIF must reproduce the
    sequential scan exactly — including the backlog case where a scaled
    alpha exceeds 1 and the integrator stays above threshold across
    consecutive frames (at most one fire per frame, like the reference
    loop), and capacity overflow."""
    rng = np.random.RandomState(7)
    for trial in range(5):
        b, t, d = 4, 57, 16
        hidden = rng.randn(b, t, d).astype(np.float32)
        scale = 0.4 if trial % 2 == 0 else 1.3
        alphas = (rng.rand(b, t) * scale).astype(np.float32)
        if trial == 3:  # backlog: alphas well above 1
            alphas[:, ::7] += 1.8
        cap = int(alphas.sum(1).max()) + (2 if trial != 4 else -3)
        cap = max(cap, 2)  # trial 4 underruns capacity (overflow dropped)
        a = np.asarray(cif_scan(jnp.asarray(hidden), jnp.asarray(alphas), cap))
        p = np.asarray(
            cif_parallel(jnp.asarray(hidden), jnp.asarray(alphas), cap)
        )
        np.testing.assert_allclose(p, a, rtol=1e-4, atol=1e-4)

    # gradients agree too (both route through the continuous parts only)
    def loss(fn):
        def f(h, a):
            return jnp.sum(fn(h, a, 6) ** 2)
        return jax.grad(f, argnums=(0, 1))

    h = jnp.asarray(rng.randn(2, 30, 8).astype(np.float32))
    al = jnp.asarray((rng.rand(2, 30) * 0.5).astype(np.float32))
    for gs, gp in zip(loss(cif_scan)(h, al), loss(cif_parallel)(h, al)):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gs), rtol=1e-4, atol=1e-4
        )


def test_cif_output_lengths():
    alphas = jnp.asarray(np.array([[0.5, 0.6, 0.9], [0.2, 0.2, 0.2]]))
    lens = np.asarray(cif_output_lengths(alphas))
    np.testing.assert_array_equal(lens, [2, 1])


def test_scale_alphas():
    rng = np.random.RandomState(0)
    alphas = jnp.asarray(rng.rand(2, 10).astype(np.float32))
    tl = jnp.asarray(np.array([4, 6], np.int32))
    scaled, raw = scale_alphas(alphas, tl)  # no noise
    np.testing.assert_allclose(np.asarray(scaled.sum(-1)), [4.0, 6.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(alphas.sum(-1)), rtol=1e-6)
    scaled_n, _ = scale_alphas(alphas, tl, jax.random.PRNGKey(0))
    s = np.asarray(scaled_n.sum(-1))
    assert np.all(np.abs(s - np.array([4.0, 6.0])) <= 0.46)


def test_cif_gradients_flow():
    rng = np.random.RandomState(0)
    hidden = jnp.asarray(rng.randn(2, 20, 4).astype(np.float32))
    alphas = jnp.asarray((rng.rand(2, 20) * 0.2).astype(np.float32))

    def f(h, a):
        return jnp.sum(cif(h, a, 4) ** 2)

    gh, ga = jax.grad(f, argnums=(0, 1))(hidden, alphas)
    assert np.isfinite(np.asarray(gh)).all()
    assert np.isfinite(np.asarray(ga)).all()
    assert float(jnp.abs(ga).sum()) > 0


def test_attention_assigner_2d():
    """CIF model with the 2D-conv assigner variant
    (reference: attention_assigner.py:49-81)."""
    from openasr_tpu.models.assigner import (
        AttentionAssigner,
        AttentionAssigner2D,
    )

    cfg2d = {"type": "2d", "d_model": 16, "n_layers": 2, "dropout": 0.0}
    asg = AttentionAssigner.from_config(cfg2d)
    assert isinstance(asg, AttentionAssigner2D)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 16), jnp.float32)
    lens = jnp.asarray([12, 7], jnp.int32)
    params = asg.init(jax.random.PRNGKey(0), x, lens)
    alphas = np.asarray(asg.apply(params, x, lens))
    assert alphas.shape == (2, 12)
    assert np.all((alphas >= 0) & (alphas <= 1))
    assert np.all(alphas[1, 7:] == 0.0)  # masked past the valid length

    # full CIF model wiring through the config switch
    cfg = Config({
        "type": "CIF",
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 16, "nhead": 2,
                    "dim_feedforward": 32, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "assigner": {"type": "2d", "d_model": 16, "n_layers": 2,
                     "dropout": 0.0},
        "decoder": {"type": "CIF_Decoder", "vocab_size": 20, "d_model": 16,
                    "nhead": 2, "num_layers": 1, "encoder_dim": 16,
                    "dim_feedforward": 32, "activation": "relu",
                    "dropout_rate": 0.0},
    })
    m = get_model_class("CIF").create_model(cfg)
    batch = _speech_batch()
    out = m.loss(m.params, batch, {}, train=False)
    assert np.isfinite(float(out["ce_loss"]))


@pytest.fixture
def cif_cfg():
    return {
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer", "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "assigner": {"d_model": 32, "n_layers": 2, "w_context": 3, "dropout": 0.0},
        "decoder": {"type": "CIF_Decoder", "vocab_size": 20, "d_model": 32,
                    "nhead": 2, "num_layers": 1, "encoder_dim": 32,
                    "dim_feedforward": 64, "activation": "relu",
                    "dropout_rate": 0.0},
    }


def _speech_batch():
    rng = np.random.RandomState(0)
    b, t, d, u = 3, 64, 20, 6
    batch = {
        "feats": rng.randn(b, t, d).astype(np.float32),
        "feat_lengths": np.array([64, 48, 40], np.int32),
        "ids": rng.randint(3, 19, (b, u)).astype(np.int32),
        "labels": rng.randint(3, 19, (b, u)).astype(np.int32),
        "paddings": np.zeros((b, u), np.float32),
    }
    batch["paddings"][:, 4:] = 1
    return batch


@pytest.mark.parametrize("mtype", ["CIF", "ctc_cif"])
def test_cif_models_train_and_decode(cif_cfg, mtype):
    cfg = Config(dict(cif_cfg, type=mtype))
    m = get_model_class(mtype).create_model(cfg)
    batch = _speech_batch()
    rngs = {"dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    out = m.loss(m.params, batch, rngs, train=True, label_smooth=0.1)
    for k, v in out.items():
        assert np.isfinite(float(v)), (k, v)
    if mtype == "ctc_cif":
        assert "ctc_loss" in out
    preds, lens, scores = m.batch_beam_decode(
        m.params, batch["feats"], batch["feat_lengths"], beam_size=2,
        max_decode_len=8,
    )
    assert preds.shape == (3, 2, 8)
    assert np.all(np.asarray(lens) <= 8)

    # package/restore
    pkg = m.package()
    m2 = get_model_class(mtype).create_model(cfg, rng=jax.random.PRNGKey(9))
    m2.restore(pkg)
    a = float(m.loss(m.params, batch, {}, train=False)["ce_loss"])
    b_ = float(m2.loss(m2.params, batch, {}, train=False)["ce_loss"])
    assert a == pytest.approx(b_)


def test_cif_fc_and_mix(cif_cfg):
    rng = np.random.RandomState(1)
    batch = _speech_batch()
    pbatch = {
        "feats": batch["feats"], "feat_lengths": batch["feat_lengths"],
        "phones": rng.randint(3, 19, (3, 5)).astype(np.int32),
        "phone_lengths": np.array([5, 4, 3], np.int32),
    }
    rngs = {"dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}

    m = get_model_class("CIF_FC").create_model(Config(dict(cif_cfg, type="CIF_FC")))
    out = m.loss(m.params, pbatch, rngs, train=True)
    assert all(np.isfinite(float(v)) for v in out.values())
    ids, lens = m.greedy_phone_decode(
        m.params, batch["feats"], batch["feat_lengths"], max_decode_len=8
    )
    assert ids.shape == (3, 8)

    cfg = Config(dict(cif_cfg, type="CIF_MIX"))
    cfg.decoder["type"] = "TransformerDecoder"
    mm = get_model_class("CIF_MIX").create_model(cfg)
    mix = dict(pbatch, ids=batch["ids"], labels=batch["labels"],
               paddings=batch["paddings"])
    out_paired = mm.loss(mm.params, mix, rngs, train=True)
    assert "ce_char_loss" in out_paired
    out_ac = mm.loss(mm.params, pbatch, rngs, train=True)
    assert "ce_char_loss" not in out_ac


def test_cif_mix_solver_dual_loader(cif_cfg, tmp_path):
    """CIFMIXSolver's acoustic+paired alternation: one epoch over two tiny
    loaders, both batch modes hitting the jitted step (the reference zipped
    loaders with two backward passes, src/solvers/cif.py:433-492)."""
    from openasr_tpu.parallel import make_mesh
    from openasr_tpu.solvers import get_solver_class

    rng = np.random.RandomState(0)
    cfg = Config(dict(cif_cfg, type="CIF_MIX"))
    cfg.decoder["type"] = "TransformerDecoder"
    model = get_model_class("CIF_MIX").create_model(cfg)

    def ac_batch():
        return {
            "feats": rng.randn(2, 24, 20).astype(np.float32),
            "feat_lengths": np.array([24, 20], np.int32),
            "phones": rng.randint(3, 19, (2, 5)).astype(np.int32),
            "phone_lengths": np.array([5, 4], np.int32),
        }

    def paired_batch():
        b = ac_batch()
        b["ids"] = rng.randint(3, 19, (2, 4)).astype(np.int32)
        b["labels"] = rng.randint(3, 19, (2, 4)).astype(np.int32)
        b["paddings"] = np.zeros((2, 4), np.float32)
        return b

    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / "exp"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1, "lambda_ctc": 0.5, "lambda_qua": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 50,
                         "d_model": 16},
    })
    solver = get_solver_class("CIF_MIX")(
        model, training, [paired_batch() for _ in range(2)],
        [paired_batch()], acoustic_loader=[ac_batch() for _ in range(3)],
        mesh=make_mesh(jax.devices("cpu")[:2]),
    )
    tr = solver.iter_one_epoch()
    assert np.isfinite(tr)
    assert solver.step == 3  # one step per acoustic batch


def _opt_counts(opt_state):
    """All optax step counters in the state tree (adam + schedule).

    Excludes apply_if_finite's notfinite_count — that one counts *rejected*
    steps (it should stay 0 here), not applied updates.
    """
    return [
        int(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]
        if "count" in (ks := jax.tree_util.keystr(path))
        and "notfinite" not in ks
    ]


def test_cif_mix_one_update_per_iteration(cif_cfg, tmp_path):
    """The CIF_MIX iteration must be ONE optimizer update over the summed
    (acoustic + paired) gradients — the reference's two backward passes
    into a single optimizer.step() (src/solvers/cif.py:433-492) — not two
    Adam updates with LR-schedule drift."""
    from openasr_tpu.parallel import make_mesh, shard_batch
    from openasr_tpu.solvers import array_fields, get_solver_class

    rng = np.random.RandomState(3)
    cfg = Config(dict(cif_cfg, type="CIF_MIX"))
    cfg.decoder["type"] = "TransformerDecoder"

    ac = {
        "feats": rng.randn(2, 24, 20).astype(np.float32),
        "feat_lengths": np.array([24, 20], np.int32),
        "phones": rng.randint(3, 19, (2, 5)).astype(np.int32),
        "phone_lengths": np.array([5, 4], np.int32),
    }
    paired = dict(
        ac,
        ids=rng.randint(3, 19, (2, 4)).astype(np.int32),
        labels=rng.randint(3, 19, (2, 4)).astype(np.int32),
        paddings=np.zeros((2, 4), np.float32),
    )
    # SGD keeps the update LINEAR in the gradients, so fp reassociation
    # noise stays ~1e-13 while a double-update / LR-schedule drift (the bug
    # this test guards) still shifts params by a full lr*grad.
    training = Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / "exp"),
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-2, "optimtype": "sgd", "grad_max_norm": 0.0,
        "label_smooth": 0.1, "lambda_ctc": 0.5, "lambda_qua": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 50,
                         "d_model": 16},
    })

    def fresh_solver():
        model = get_model_class("CIF_MIX").create_model(cfg)
        return get_solver_class("CIF_MIX")(
            model, training, [paired], [paired], acoustic_loader=[ac],
            mesh=make_mesh(jax.devices("cpu")[:2]),
        ), model

    solver, model = fresh_solver()
    counts0 = _opt_counts(solver.opt_state)
    assert counts0, "no optax step counter found in the opt state"
    solver.iter_one_epoch()
    counts1 = _opt_counts(solver.opt_state)
    assert solver.step == 1
    assert [c1 - c0 for c0, c1 in zip(counts0, counts1)] == [1] * len(counts0)

    # fused reference: grad of the SUM of both mixed losses, one tx.update
    import optax

    solver2, model2 = fresh_solver()
    params = model2.params
    base_rng = jax.random.fold_in(solver2.rng, 0 * 8191 + 1)
    batches = [
        shard_batch(array_fields(b), solver2.mesh) for b in (ac, paired)
    ]

    def loss_fn(p):
        total = 0.0
        for j, arrays in enumerate(batches):
            rj = jax.random.fold_in(base_rng, j)
            rngs = {"dropout": rj, "aug": jax.random.fold_in(rj, 1)}
            total = total + solver2.mix_losses(
                solver2.model_loss(p, arrays, rngs, True)
            )
        return total

    grads = jax.grad(loss_fn)(params)
    updates, _ = solver2.tx.update(grads, solver2.opt_state, params)
    ref_params = optax.apply_updates(params, updates)

    got = jax.tree_util.tree_flatten_with_path(solver.model.params)[0]
    ref = dict(
        (jax.tree_util.keystr(p), np.asarray(leaf))
        for p, leaf in jax.tree_util.tree_flatten_with_path(ref_params)[0]
    )
    for path, leaf in got:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), ref[key], rtol=1e-4, atol=1e-9, err_msg=key
        )
