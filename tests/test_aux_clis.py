"""CLI-level smoke tests for the auxiliary entry points: train_lm,
train_phone2char (CE + CTC), train_cpc --type pretrain, and
semi_train_phone2char.  Tiny shapes, one epoch each — these pin the argument
parsing / config plumbing / loader wiring, which the model-level tests
don't touch."""

import json
import os

import numpy as np
import pytest
import yaml

from openasr_tpu.data.audio import read_wav


@pytest.fixture(scope="module")
def aux(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("aux_cli")
    rng = np.random.RandomState(0)

    # char + phone vocabs
    chars = ["a", "b", "c", "d"]
    phones = ["P1", "P2", "P3"]
    (tmp / "chars.txt").write_text("\n".join(chars) + "\n")
    (tmp / "phones.txt").write_text("\n".join(phones) + "\n")

    # phone->char pairs
    pairs = []
    for i in range(12):
        np_, nc = rng.randint(2, 5), rng.randint(2, 5)
        pairs.append({
            "uttid": f"p{i}",
            "phones": " ".join(rng.choice(phones, np_)),
            "phone_length": int(np_),
            "tokens": " ".join(rng.choice(chars, nc)),
            "token_length": int(nc),
        })
    (tmp / "pairs.json").write_text(json.dumps(pairs))

    # unpaired token lines
    (tmp / "unpaired_phone.txt").write_text(
        "\n".join(" ".join(rng.choice(phones, 3)) for _ in range(8)) + "\n"
    )
    (tmp / "unpaired_text.txt").write_text(
        "\n".join(" ".join(rng.choice(chars, 3)) for _ in range(8)) + "\n"
    )

    # LM text
    (tmp / "lm.txt").write_text(
        "\n".join(" ".join(rng.choice(chars, 4)) for _ in range(16)) + "\n"
    )

    # wave manifest for CPC (real audio, short)
    wav = os.path.abspath("tests/data/BAC009S0764W0121.wav")
    sr, w = read_wav(wav)
    waves = [{"uttid": f"w{i}", "feat": wav, "feat_length": len(w),
              "tokens": "a b", "token_length": 2} for i in range(3)]
    (tmp / "waves.json").write_text(json.dumps(waves))
    return tmp


def _training(tmp, name, **extra):
    cfg = {
        "num_epoch": 1, "exp_dir": str(tmp / f"exp_{name}"),
        "print_inteval": 100, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 50,
                         "d_model": 16},
    }
    cfg.update(extra)
    return cfg


def test_train_lm_cli(aux):
    from openasr_tpu.bin.train_lm import main

    cfg = {
        "data": {"trainset": str(aux / "lm.txt"), "devset": str(aux / "lm.txt"),
                 "vocab_path": str(aux / "chars.txt"), "fetchworker_num": 0},
        "model": {"type": "lstm_lm", "d_model": 16, "n_layers": 1,
                  "dropout_rate": 0.0},
        "training": _training(aux, "lm", batch_size=4),
    }
    path = aux / "lm.yaml"
    path.write_text(yaml.safe_dump(cfg))
    main([str(path)])
    assert os.path.exists(aux / "exp_lm" / "last.pkg")


@pytest.mark.parametrize("mtype", ["Embed_Decoder", "Embed_Decoder_CTC"])
def test_train_phone2char_cli(aux, mtype):
    from openasr_tpu.bin.train_phone2char import main

    model = {
        "type": mtype,
        "add_eos": True,
        "add_blk": mtype == "Embed_Decoder_CTC",
        "encoder": {"vocab_size": -1, "d_model": 16},
        "decoder": {"type": "TransformerDecoder", "vocab_size": -1,
                    "d_model": 16, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 16, "dim_feedforward": 32,
                    "activation": "relu", "dropout_rate": 0.0},
    }
    cfg = {
        "data": {"trainset": str(aux / "pairs.json"),
                 "devset": str(aux / "pairs.json"),
                 "vocab_phone": str(aux / "phones.txt"),
                 "vocab_char": str(aux / "chars.txt"),
                 "fetchworker_num": 0},
        "model": model,
        "training": _training(aux, f"p2c_{mtype}", batch_phones=16),
    }
    path = aux / f"p2c_{mtype}.yaml"
    path.write_text(yaml.safe_dump(cfg))
    main([str(path)])
    assert os.path.exists(aux / f"exp_p2c_{mtype}" / "last.pkg")


def test_train_cpc_pretrain_cli(aux):
    from openasr_tpu.bin.train_cpc import main

    cfg = {
        "data": {"trainset": str(aux / "waves.json"),
                 "devset": str(aux / "waves.json"), "fetchworker_num": 0},
        "model": {"signal": {"d_model": 8},
                  "cpc": {"d_input": 8, "d_coding": 8, "n_layers": 1,
                          "n_steps": 2}},
        "training": _training(aux, "cpc", batch_time=200000),
    }
    path = aux / "cpc.yaml"
    path.write_text(yaml.safe_dump(cfg))
    main([str(path), "--type", "pretrain"])
    assert os.path.exists(aux / "exp_cpc" / "last.pkg")


def test_semi_train_phone2char_cli(aux):
    from openasr_tpu.bin.semi_train_phone2char import main

    cfg = {
        "data": {"trainset": str(aux / "pairs.json"),
                 "devset": str(aux / "pairs.json"),
                 "unpaired_phone": str(aux / "unpaired_phone.txt"),
                 "unpaired_text": str(aux / "unpaired_text.txt"),
                 "vocab_phone": str(aux / "phones.txt"),
                 "vocab_char": str(aux / "chars.txt"),
                 "fetchworker_num": 0},
        "model": {
            "type": "gan_phone2char",
            "add_blk": True,
            "G": {
                "encoder": {"vocab_size": -1, "d_model": 16},
                "decoder": {"vocab_size": -1, "d_model": 16, "nhead": 2,
                            "num_layers": 1, "encoder_dim": 16,
                            "dim_feedforward": 32, "activation": "relu",
                            "dropout_rate": 0.0},
            },
            "D": {"encoder": {"d_input": -1, "d_model": 16, "layer_num": 1}},
        },
        "training": _training(
            aux, "semi", batch_phones=16, lambda_gp=10.0, d_steps=1,
        ),
    }
    path = aux / "semi.yaml"
    path.write_text(yaml.safe_dump(cfg))
    main([str(path)])
    assert os.path.exists(aux / "exp_semi" / "last.pkg")


def test_infer_phone2char_cli(aux):
    """Decode with the CTC phone2char model trained above; writes hyp/ref
    files and prints WER (reference: src/infer_phone2char.py:108-151)."""
    from openasr_tpu.bin.infer_phone2char import main

    out_dir = aux / "decode_p2c"
    main([
        "--model_type", "Embed_Decoder_CTC",
        "--model_pkg", str(aux / "exp_p2c_Embed_Decoder_CTC" / "last.pkg"),
        "--vocab_phone", str(aux / "phones.txt"),
        "--vocab_char", str(aux / "chars.txt"),
        "--json_file", str(aux / "pairs.json"),
        "--output_dir", str(out_dir),
        "--batch_phones", "64",
        "--nbest", "1",
        "--maxlen", "8",
        "--add_blk",
    ])
    hyp = (out_dir / "hyp.txt").read_text().strip().split("\n")
    ref = (out_dir / "ref.txt").read_text().strip().split("\n")
    assert len(hyp) == len(ref) == 12


def test_tensorboard_metric_mirror(tmp_path):
    """training.tensorboard: true mirrors metrics.jsonl scalars into a
    TensorBoard event file (restores the reference README's advertised
    tensorboardX curves; reference: src/utils.py:14)."""
    pytest.importorskip("torch.utils.tensorboard")
    from openasr_tpu.config import Config
    from openasr_tpu.solvers import Solver

    s = Solver.__new__(Solver)
    s.exp_dir = str(tmp_path)
    s.config = Config({"tensorboard": True})
    s.is_host0 = True
    s._log_metrics(
        {"phase": "train", "epoch": 1, "step": 3, "loss": 2.5, "lr": 1e-3}
    )
    s._log_metrics({"phase": "epoch", "epoch": 1, "step": 3, "tr_loss": 2.0})

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(os.path.join(str(tmp_path), "tb"))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"train/loss", "train/lr", "epoch/tr_loss"} <= tags
    ev = acc.Scalars("train/loss")[0]
    assert ev.step == 3 and abs(ev.value - 2.5) < 1e-6
    # the jsonl stream is still written alongside
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
