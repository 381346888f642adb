"""Config validation: unknown-key warnings + required-key errors.

The reference read YAML sections ad hoc (reference: src/train.py:55-61),
so a typo like `feature_size:` for `num_mel_bins:` silently trained with
the default mel count, and a missing `lr_scheduler` crashed with a bare
KeyError inside the solver.  validate_config turns both into diagnostics
at load time.
"""

import glob
import os

import pytest
import yaml

from openasr_tpu.config import validate_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_recipe_configs_validate_clean():
    configs = glob.glob(os.path.join(REPO, "egs", "*", "configs", "*.yaml"))
    assert len(configs) >= 40
    for path in configs:
        cfg = yaml.safe_load(open(path))
        unknown = validate_config(cfg)
        assert unknown == [], f"{path}: unexpected unknown keys {unknown}"


def test_unknown_key_warns_with_hint(caplog):
    cfg = {"model": {"signal": {"feature_type": "fbank",
                                "num_mel_bin": 40}}}
    with caplog.at_level("WARNING"):
        unknown = validate_config(cfg)
    assert unknown == ["model.signal.num_mel_bin"]
    assert "did you mean 'num_mel_bins'" in caplog.text


def test_unknown_key_in_nested_section(caplog):
    cfg = {"training": {"lr_scheduler": {"type": "warmup_transformer",
                                         "warmup_steps": 4000}}}
    with caplog.at_level("WARNING"):
        unknown = validate_config(cfg)
    assert unknown == ["training.lr_scheduler.warmup_steps"]
    assert "warmup_step" in caplog.text


def test_missing_required_raises():
    cfg = {"data": {"trainset": "x"}, "training": {}}
    with pytest.raises(ValueError, match="training.lr_scheduler.type"):
        validate_config(cfg, required=("data.trainset",
                                       "training.lr_scheduler.type"))


def test_required_present_passes():
    cfg = {"data": {"trainset": "x"},
           "training": {"lr_scheduler": {"type": "linear"}}}
    assert validate_config(
        cfg, required=("data.trainset", "training.lr_scheduler.type")
    ) == []


def test_unschema_sections_not_descended():
    # sections without a schema entry are free-form
    cfg = {"model": {"cpc": {"d_input": 1, "d_coding": 2,
                             "n_layers": 1, "n_steps": 4}},
           "extra_section_no_schema": {"anything": 1}}
    unknown = validate_config(cfg)
    assert unknown == ["extra_section_no_schema"]


def test_moe_validation_runs_at_load_time():
    """validate_config invokes validate_moe on the model section: a bad
    MoE config fails at YAML-load time with an actionable message, not
    minutes later at create_model (see tests/test_moe.py for the full
    field matrix)."""
    import pytest

    cfg = {
        "model": {
            "type": "conv-ctc-transformer",
            "encoder": {"input_dim": 80, "d_model": 32, "nhead": 2,
                        "dim_feedforward": 64, "num_layers": 2,
                        "activation": "glu",
                        "moe": {"num_experts": 4, "every": 0}},
        }
    }
    with pytest.raises(ValueError, match="every"):
        validate_config(cfg)
    cfg["model"]["encoder"]["moe"]["every"] = 2
    validate_config(cfg)  # the corrected config passes
