"""accumulate_grad_batch must be honored in the dual-loader epochs.

The reference decrements `n_accu_batch` per iteration and steps the
optimizer only on the boundary — or at epoch end for the remainder
(src/solvers/cif.py:430-503, src/solvers/phone2char.py:272-316).  These
tests count optimizer-state `count` increments across an epoch."""

import jax
import numpy as np
import pytest

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.parallel import make_mesh
from openasr_tpu.solvers import get_solver_class


def _opt_counts(opt_state):
    return [
        int(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]
        if "count" in jax.tree_util.keystr(path)
    ]


def _training(tmp_path, accum):
    return Config({
        "num_epoch": 1, "exp_dir": str(tmp_path / "exp"),
        "print_inteval": 1000, "accumulate_grad_batch": accum,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1, "lambda_ctc": 0.5, "lambda_qua": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 50,
                         "d_model": 16},
    })


@pytest.mark.parametrize("accum,n_batches,want_updates", [
    (1, 3, 3),
    (2, 3, 2),   # boundary at niter=2, epoch-end flush at niter=3
    (4, 3, 1),   # never hits the boundary: single epoch-end flush
])
def test_cif_mix_accumulation_boundary(tmp_path, accum, n_batches,
                                       want_updates):
    rng = np.random.RandomState(0)
    cfg = Config({
        "type": "CIF_MIX", "add_eos": True, "add_blk": True,
        "vocab_phone": 19, "vocab_size": 19,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 16, "nhead": 2,
                    "dim_feedforward": 32, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "assigner": {"d_model": 16, "n_layers": 1, "w_context": 3,
                     "dropout": 0.0},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 19,
                    "d_model": 16, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 16, "dim_feedforward": 32,
                    "activation": "relu", "dropout_rate": 0.0},
    })

    def ac_batch():
        return {
            "feats": rng.randn(2, 24, 20).astype(np.float32),
            "feat_lengths": np.array([24, 20], np.int32),
            "phones": rng.randint(3, 19, (2, 5)).astype(np.int32),
            "phone_lengths": np.array([5, 4], np.int32),
        }

    def paired_batch():
        b = ac_batch()
        return dict(
            b,
            ids=rng.randint(3, 19, (2, 4)).astype(np.int32),
            labels=rng.randint(3, 19, (2, 4)).astype(np.int32),
            paddings=np.zeros((2, 4), np.float32),
        )

    model = get_model_class("CIF_MIX").create_model(cfg)
    solver = get_solver_class("CIF_MIX")(
        model, _training(tmp_path, accum), [paired_batch()],
        [paired_batch()],
        acoustic_loader=[ac_batch() for _ in range(n_batches)],
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    counts0 = _opt_counts(solver.opt_state)
    tr = solver.iter_one_epoch()
    assert np.isfinite(tr)
    counts1 = _opt_counts(solver.opt_state)
    assert solver.step == want_updates
    assert [c1 - c0 for c0, c1 in zip(counts0, counts1)] == (
        [want_updates] * len(counts0)
    )


@pytest.mark.parametrize("accum,n_batches,want_updates", [
    (2, 3, 2),
    (1, 2, 2),
])
def test_gan_accumulation_boundary(tmp_path, accum, n_batches, want_updates):
    rng = np.random.RandomState(1)
    cfg = Config({
        "type": "gan_phone2char",
        "G": {
            "encoder": {"vocab_size": 15, "d_model": 32},
            "decoder": {"vocab_size": 20, "d_model": 32, "nhead": 2,
                        "num_layers": 1, "dim_feedforward": 64,
                        "activation": "relu", "dropout_rate": 0.0},
        },
        "D": {"encoder": {"d_input": 20, "d_model": 32, "layer_num": 2}},
    })

    def paired():
        return {
            "phones": rng.randint(3, 14, (2, 7)).astype(np.int32),
            "phone_lengths": np.array([7, 5], np.int32),
            "labels": rng.randint(3, 19, (2, 5)).astype(np.int32),
            "paddings": np.zeros((2, 5), np.float32),
        }

    def tokens(hi, width):
        return {
            "tokens": rng.randint(3, hi, (2, width)).astype(np.int32),
            "token_lengths": np.array([width, width - 1], np.int32),
        }

    model = get_model_class("gan_phone2char").create_model(cfg)
    solver = get_solver_class("gan_phone2char")(
        model, _training(tmp_path, accum), [paired()], [],
        phone_loader=[tokens(12, 6) for _ in range(n_batches)],
        text_loader=[tokens(15, 5)],
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    counts0 = _opt_counts(solver.opt_state)
    tr = solver.iter_one_epoch()
    assert np.isfinite(tr)
    counts1 = _opt_counts(solver.opt_state)
    assert solver.step == want_updates
    assert [c1 - c0 for c0, c1 in zip(counts0, counts1)] == (
        [want_updates] * len(counts0)
    )


def test_accum_threads_batch_stats(tmp_path):
    """accumulate_grad_batch > 1 must update BatchNorm running statistics
    exactly like the single-step path — the grad-accumulation micro-steps
    thread batch_stats through and write the final collection back."""
    rng = np.random.RandomState(2)
    cfg = Config({
        "type": "gru_ctc",
        "signal": {"d_model": 16},
        "encoder": {"d_input": 16, "d_model": 16, "n_layers": 1,
                    "dropout": 0.0},
        "decoder": {"vocab_size": 10},
    })
    model = get_model_class("gru_ctc").create_model(cfg)

    n = 160 * 12
    def wave_batch():
        return {
            "waves": rng.randn(2, n).astype(np.float32),
            "wave_lengths": np.array([n, n - 320], np.int32),
            "ids": rng.randint(1, 8, (2, 3)).astype(np.int32),
            "labels": rng.randint(1, 8, (2, 3)).astype(np.int32),
            "paddings": np.zeros((2, 3), np.float32),
        }

    solver = get_solver_class("gru_ctc")(
        model, _training(tmp_path, 2), [wave_batch() for _ in range(2)],
        [], mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    before = [
        np.asarray(x).copy()
        for x in jax.tree_util.tree_leaves(solver.model.batch_stats)
    ]
    tr = solver.iter_one_epoch()
    assert np.isfinite(tr)
    after = jax.tree_util.tree_leaves(solver.model.batch_stats)
    assert len(before) == len(after) > 0
    assert any(
        not np.allclose(b, np.asarray(a)) for b, a in zip(before, after)
    ), "running statistics never moved under grad accumulation"
