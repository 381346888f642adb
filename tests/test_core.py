"""Tests for config, tokenizer, masks, schedules, metrics."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from openasr_tpu.config import Config, load_config, parse_range
from openasr_tpu.data.tokenizer import CharTokenizer, SubwordTokenizer
from openasr_tpu.ops import masks
from openasr_tpu.ops.schedules import get_schedule
from openasr_tpu.utils.metrics import edit_distance, wer


# ---------------------------------------------------------------- config

def test_config_attr_access(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "data:\n  trainset: x.json\nmodel:\n  type: conv-ctc-transformer\n"
        "  encoder:\n    d_model: 512\ntraining:\n  init_lr: 1.0\n"
    )
    cfg = load_config(str(p))
    assert cfg.model.type == "conv-ctc-transformer"
    assert cfg.model.encoder.d_model == 512
    assert cfg.continue_training is None  # missing key -> None
    assert cfg.training["init_lr"] == 1.0
    d = cfg.to_dict()
    assert isinstance(d["model"], dict) and not isinstance(d["model"], Config)


def test_config_override_and_range():
    cfg = Config({"a": {"b": 1, "c": 2}})
    cfg.override({"a": {"b": 10}})
    assert cfg.a.b == 10 and cfg.a.c == 2
    assert parse_range("1,1000") == (1, 1000)
    assert parse_range([3, 7]) == (3, 7)
    assert parse_range(None) is None


# ------------------------------------------------------------- tokenizer

@pytest.fixture
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("a 100\nb 50\nc 10\n")
    return str(p)


def test_char_tokenizer(vocab_file):
    tok = CharTokenizer(vocab_file, add_blk=True)
    # <unk>=0 <sos>=1 <eos>=2, a=3 b=4 c=5, <blk>=6
    assert tok.unit_num() == 7
    assert tok.to_id("<unk>") == 0 and tok.to_id("<sos>") == 1
    assert tok.to_id("a") == 3
    assert tok.blank_id == 6
    assert tok.encode("a b z") == [3, 4, 0]
    assert tok.decode([1, 3, 4, 2]) == "a b"
    assert tok.decode([3, 4], split_token=False) == "ab"


def test_subword_tokenizer(tmp_path):
    p = tmp_path / "bpe.txt"
    p.write_text("he@@ 5\nllo 3\n")
    tok = SubwordTokenizer(str(p))
    assert tok.decode([3, 4]) == "hello"


# ----------------------------------------------------------------- masks

def test_sequence_mask():
    m = masks.sequence_mask(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]]
    )


def test_padding_and_causal_bias():
    pb = masks.padding_bias(jnp.array([1, 3]), 3)
    assert pb.shape == (2, 1, 1, 3)
    assert pb[0, 0, 0, 0] == 0.0 and pb[0, 0, 0, 2] == masks.NEG_INF
    cb = masks.causal_bias(3)
    assert cb.shape == (1, 1, 3, 3)
    assert cb[0, 0, 0, 1] == masks.NEG_INF and cb[0, 0, 2, 1] == 0.0
    comb = masks.combine_bias(pb, cb)
    assert comb.shape == (2, 1, 3, 3)
    assert comb.min() >= masks.NEG_INF


# ------------------------------------------------------------- schedules

def test_noam_schedule():
    sched = get_schedule({"type": "warmup_transformer", "warmup_step": 100, "d_model": 512})
    # reference formula (src/schedule.py:118-131)
    for step in [1, 50, 100, 1000]:
        want = 512 ** -0.5 * min(step ** -0.5, step * 100 ** -1.5)
        assert math.isclose(float(sched(step)), want, rel_tol=1e-5)
    # warmup peak at warmup_step
    assert float(sched(100)) >= float(sched(50))
    assert float(sched(100)) >= float(sched(200))


def test_linear_schedules():
    lin = get_schedule({"type": "linear", "x0": 0, "y0": 1.0, "x1": 100, "y1": 0.0})
    assert float(lin(0)) == 1.0 and abs(float(lin(50)) - 0.5) < 1e-6
    assert float(lin(200)) == 0.0
    wl = get_schedule(
        {"type": "warmup_linear", "warmup_step": 10, "x0": 0, "y0": 1.0, "x1": 100, "y1": 0.0}
    )
    assert abs(float(wl(5)) - 0.5) < 1e-6  # ramping up
    assert abs(float(wl(50)) - 0.5) < 1e-6  # decaying


def test_bob_schedule():
    bob = get_schedule({"type": "bob", "decay_coef": 0.5, "tolerate": 0.01})
    bob.update(10.0)
    assert float(bob(0)) == 1.0
    bob.update(9.0)  # 10% improvement, no decay
    assert float(bob(0)) == 1.0
    bob.update(8.99)  # ~0.1% improvement < 1% tolerate -> decay
    assert float(bob(0)) == 0.5
    state = bob.pack_state()
    bob2 = get_schedule({"type": "bob", "decay_coef": 0.5, "tolerate": 0.01})
    bob2.restore_state(state)
    assert float(bob2(0)) == 0.5


# --------------------------------------------------------------- metrics

def test_edit_distance():
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("abc", "axc") == 1
    assert edit_distance("abc", "") == 3
    assert edit_distance("kitten", "sitting") == 3


def test_wer():
    out = wer([list("abc"), list("de")], [list("abc"), list("dx")])
    assert out["n_ref"] == 5
    assert abs(out["wer"] - 20.0) < 1e-6
    assert abs(out["sub"] - 20.0) < 1e-6


def test_model_type_alias_resolution():
    """Reference YAMLs spell types inconsistently (Conv_CTC vs conv-ctc,
    CPC_Model vs encoder_cpc); lookup must be case/-/_ insensitive."""
    from openasr_tpu.models import get_model_class
    from openasr_tpu.solvers import get_solver_class

    assert get_model_class("Conv_CTC") is get_model_class("conv-ctc")
    assert get_model_class("Conv_CTC_Transformer") is get_model_class(
        "conv-ctc-transformer"
    )
    assert get_model_class("CPC_Model") is get_model_class("encoder_cpc")
    assert get_model_class("cif") is get_model_class("CIF")
    assert get_solver_class("Conv_CTC") is get_solver_class("conv-ctc")
    import pytest

    with pytest.raises(ValueError):
        get_model_class("definitely_not_a_model")


def test_bob_decay_reaches_the_jitted_step(tmp_path):
    """BobSchedule's decay_rate is HOST state baked into the jitted train
    step as a trace-time constant — without Solver._refresh_jitted_steps a
    plateau decay would change the logged lr but never the applied one.
    A step after refresh at rate 0.5 must move params ~half as far."""
    import jax

    from openasr_tpu.models import get_model_class
    from openasr_tpu.parallel import make_mesh
    from openasr_tpu.solvers import array_fields, get_solver_class

    from test_train_e2e import model_config

    cfg = model_config(8)
    rng = np.random.RandomState(0)
    b, t, d, u = 4, 32, 20, 5
    batch = {
        "feats": rng.randn(b, t, d).astype(np.float32),
        "feat_lengths": np.full(b, t, np.int32),
        "ids": rng.randint(3, 7, (b, u)).astype(np.int32),
        "labels": rng.randint(3, 7, (b, u)).astype(np.int32),
        "paddings": np.zeros((b, u), np.float32),
    }

    def delta_for(decayed):
        model = get_model_class(cfg.type).create_model(cfg)
        training = Config({
            "num_epoch": 1, "exp_dir": str(tmp_path / f"bob{decayed}"),
            "print_inteval": 1000, "accumulate_grad_batch": 1,
            "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 50.0,
            "label_smooth": 0.1, "lambda_ctc": 0.5,
            "lr_scheduler": {"type": "bob", "decay_coef": 0.5,
                             "tolerate": 1.0},
        })
        solver = get_solver_class(cfg.type)(
            model, training, [], [],
            mesh=make_mesh(jax.devices("cpu")[:1]),
        )
        p0 = jax.tree_util.tree_map(np.asarray, jax.device_get(model.params))
        if decayed:
            # two updates with no improvement -> one decay (as train() does)
            solver.schedule.update(1.0)
            solver.schedule.update(1.0)
            assert solver.schedule.decay_rate == 0.5
            solver._refresh_jitted_steps()
        from openasr_tpu.parallel import shard_batch

        arrays = shard_batch(array_fields(batch), solver.mesh)
        params, _, _, _ = solver._train_step(
            model.params, solver.opt_state, arrays, jax.random.PRNGKey(3)
        )
        p1 = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
        leaves0 = jax.tree_util.tree_leaves(p0)
        leaves1 = jax.tree_util.tree_leaves(p1)
        return float(sum(
            np.abs(a - b).sum() for a, b in zip(leaves0, leaves1)
        ))

    d_full = delta_for(False)
    d_half = delta_for(True)
    assert d_full > 0
    # Adam's first bias-corrected update is ~lr*sign(g): halving the rate
    # must ~halve the parameter movement (it was bit-identical pre-fix)
    assert 0.4 < d_half / d_full < 0.6, (d_half, d_full)
