"""CLI integration tests: train -> checkpoint averaging -> infer -> score."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from openasr_tpu.data import kaldi_io


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.RandomState(0)
    units = ["a", "b", "c", "d"]
    (tmp / "vocab.txt").write_text("\n".join(units) + "\n")

    mats, samples, refs = [], [], []
    for i in range(12):
        n_tok = rng.randint(2, 5)
        toks = rng.randint(0, 4, size=n_tok)
        t = 24 + 8 * n_tok
        feat = rng.randn(t, 20).astype(np.float32) * 0.1
        for j, tok in enumerate(toks):
            feat[j * 8 : j * 8 + 8, tok * 4 : tok * 4 + 4] += 1.0
        key = f"utt{i:02d}"
        mats.append((key, feat))
        text = " ".join(units[x] for x in toks)
        samples.append({"uttid": key, "feat_length": t, "tokens": text,
                        "token_length": int(n_tok)})
        refs.append(f"{key} {text}")
    prefix = str(tmp / "feats")
    kaldi_io.write_ark_scp(prefix, mats)
    scp = dict(l.strip().split(" ", 1) for l in open(prefix + ".scp"))
    for s in samples:
        s["feat"] = scp[s["uttid"]]
    (tmp / "train.json").write_text(json.dumps(samples))
    (tmp / "test_text.txt").write_text("\n".join(refs) + "\n")

    cfg = {
        "data": {
            "trainset": str(tmp / "train.json"),
            "devset": str(tmp / "train.json"),
            "vocab_path": str(tmp / "vocab.txt"),
            "feat_range": "1,2000",
            "label_range": "1,60",
            "fetchworker_num": 0,
        },
        "model": {
            "type": "conv-ctc-transformer",
            "add_eos": True,
            "add_blk": True,
            "signal": {"feature_type": "offline"},
            "encoder": {"type": "Transformer",
                        "sub": {"type": "ConvV2", "layer_num": 1},
                        "input_dim": 20, "d_model": 32, "nhead": 2,
                        "dim_feedforward": 64, "activation": "relu",
                        "num_layers": 1, "dropout_rate": 0.0},
            "decoder": {"type": "TransformerDecoder", "vocab_size": -1,
                        "d_model": 32, "nhead": 2, "num_layers": 1,
                        "encoder_dim": 32, "dim_feedforward": 64,
                        "activation": "relu", "dropout_rate": 0.0},
        },
        "training": {
            "label_type": "tokens",
            "batch_frames": 300,
            "exp_dir": str(tmp / "exp"),
            "print_inteval": 100,
            "num_epoch": 2,
            "accumulate_grad_batch": 1,
            "init_lr": 0.002,
            "optimtype": "adam",
            "grad_max_norm": 5.0,
            "label_smooth": 0.1,
            "num_last_ckpt_keep": 2,
            "lambda_ctc": 0.5,
            "lr_scheduler": {"type": "warmup_transformer",
                             "warmup_step": 20, "d_model": 32},
        },
    }
    (tmp / "config.yaml").write_text(yaml.safe_dump(cfg))
    return tmp


def test_train_cli(workdir):
    from openasr_tpu.bin.train import main

    main([str(workdir / "config.yaml")])
    assert os.path.exists(workdir / "exp" / "last.pkg")
    assert os.path.exists(workdir / "exp" / "ep-0002.pkg")

    # continue training one more epoch
    import yaml as _y

    cfg = _y.safe_load(open(workdir / "config.yaml"))
    cfg["training"]["num_epoch"] = 3
    (workdir / "config3.yaml").write_text(_y.safe_dump(cfg))
    main([str(workdir / "config3.yaml"), "--continue-training"])
    assert os.path.exists(workdir / "exp" / "ep-0003.pkg")


def test_avg_tool(workdir):
    from openasr_tpu.utils.checkpoint import average_last_ckpts, load_package

    out = average_last_ckpts(str(workdir / "exp"), 2,
                             str(workdir / "exp" / "avg2.pkg"))
    pkg = load_package(out)
    assert "model" in pkg and "components" in pkg["model"]


def test_infer_cli_and_scoring(workdir):
    from openasr_tpu.bin.infer import main as infer_main

    hyp_path = str(workdir / "hyp.txt")
    infer_main([
        "--model_type", "conv-ctc-transformer",
        "--model_pkg", str(workdir / "exp" / "avg2.pkg"),
        "--vocab_path", str(workdir / "vocab.txt"),
        "--json_file", str(workdir / "train.json"),
        "--output", hyp_path,
        "--batch_frames", "300",
        "--nbest", "2",
        "--maxlen", "8",
        "--offline",
        "--add_blk",
        "--split_token",
    ])
    lines = open(hyp_path).read().strip().split("\n")
    assert len(lines) == 12
    for line in lines:
        assert line.split(" ", 1)[0].startswith("utt")

    # score with the wer tool (subprocess: it's a script)
    result = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "wer.py"),
         "--hyp", hyp_path, "--ref", str(workdir / "test_text.txt")],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert result.returncode == 0, result.stderr
    assert "WER" in result.stdout


def test_infer_cli_bf16_matches_f32(workdir):
    """--dtype bfloat16 decodes the trained model to the same hypotheses:
    beam scoring stays float32 over the logits, and the trained model's
    logit margins dwarf bf16 rounding noise."""
    from openasr_tpu.bin.infer import main as infer_main

    hyp_bf16 = str(workdir / "hyp_bf16.txt")
    infer_main([
        "--model_type", "conv-ctc-transformer",
        "--model_pkg", str(workdir / "exp" / "avg2.pkg"),
        "--vocab_path", str(workdir / "vocab.txt"),
        "--json_file", str(workdir / "train.json"),
        "--output", hyp_bf16,
        "--batch_frames", "300",
        "--nbest", "2",
        "--maxlen", "8",
        "--offline",
        "--add_blk",
        "--split_token",
        "--dtype", "bfloat16",
    ])
    f32 = dict(l.split(" ", 1) for l in
               open(workdir / "hyp.txt").read().strip().split("\n"))
    bf16 = dict(l.split(" ", 1) for l in
                open(hyp_bf16).read().strip().split("\n"))
    assert bf16 == f32


def test_train_cli_pipeline(workdir, tmp_path):
    """`train.py --pipeline 2` end-to-end on the virtual 8-device mesh:
    arg validation, pipe2 x data4 mesh construction, the stacked encoder
    layout (encoder.pipeline: true) through the real CLI train loop and
    checkpoint save — then infer.py decodes the pipelined checkpoint on
    a single device (the stacked params run the sequential-scan fallback
    without a pipe mesh, parallel/pipeline.py docstring)."""
    from openasr_tpu.bin.infer import main as infer_main
    from openasr_tpu.bin.train import main as train_main

    cfg = yaml.safe_load(open(workdir / "config.yaml"))
    cfg["model"]["encoder"]["num_layers"] = 2  # divisible by 2 stages
    cfg["model"]["encoder"]["pipeline"] = True
    cfg["training"]["exp_dir"] = str(tmp_path / "exp_pipe")
    cfg["training"]["num_epoch"] = 1
    cfg["training"]["pipeline_microbatch"] = 2
    cfg_path = tmp_path / "config_pipe.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # --pipeline without encoder.pipeline: true must fail loudly
    bad = dict(cfg, model={**cfg["model"],
                           "encoder": {**cfg["model"]["encoder"],
                                       "pipeline": False}})
    bad_path = tmp_path / "config_bad.yaml"
    bad_path.write_text(yaml.safe_dump(bad))
    with pytest.raises(SystemExit):
        train_main([str(bad_path), "--pipeline", "2"])

    train_main([str(cfg_path), "--pipeline", "2"])
    pkg_path = tmp_path / "exp_pipe" / "last.pkg"
    assert os.path.exists(pkg_path)

    hyp_path = str(tmp_path / "hyp_pipe.txt")
    infer_main([
        "--model_type", "conv-ctc-transformer",
        "--model_pkg", str(pkg_path),
        "--vocab_path", str(workdir / "vocab.txt"),
        "--json_file", str(workdir / "train.json"),
        "--output", hyp_path,
        "--batch_frames", "300",
        "--nbest", "1",
        "--maxlen", "8",
        "--offline",
        "--add_blk",
        "--split_token",
    ])
    lines = open(hyp_path).read().strip().split("\n")
    assert len(lines) == 12


def test_gen_json_tool(tmp_path):
    (tmp_path / "feats.scp").write_text("u1 /x.ark:0\nu2 /x.ark:9\n")
    (tmp_path / "utt2num_frames").write_text("u1 100\nu2 50\n")
    (tmp_path / "text").write_text("u1 你 好\nu2 世 界\n")
    out = tmp_path / "out.json"
    result = subprocess.run(
        [sys.executable, "tools/gen_json.py",
         "--feat", str(tmp_path / "feats.scp"),
         "--num_frames", str(tmp_path / "utt2num_frames"),
         "--trans", str(tmp_path / "text"),
         "--tokens", str(tmp_path / "text"),
         "--output", str(out)],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert result.returncode == 0, result.stderr
    data = json.loads(out.read_text())
    assert len(data) == 2
    assert data[0]["feat_length"] == 100
    assert data[0]["token_length"] == 2


def test_vocab_and_char_tokenizer_tools(tmp_path):
    (tmp_path / "text").write_text("u1 你好ABC [NOISE]\nu2 好的\n")
    root = os.path.join(os.path.dirname(__file__), "..")
    r1 = subprocess.run(
        [sys.executable, "tools/char_tokenizer.py",
         "--text", str(tmp_path / "text"),
         "--output", str(tmp_path / "tokens.txt")],
        capture_output=True, text=True, cwd=root,
    )
    assert r1.returncode == 0, r1.stderr
    toks = open(tmp_path / "tokens.txt").read()
    # pure-CJK tokens split to chars; tokens containing Latin stay whole
    assert "好 的" in toks and "[NOISE]" in toks and "你好ABC" in toks
    r2 = subprocess.run(
        [sys.executable, "tools/vocab.py",
         "--text", str(tmp_path / "tokens.txt"),
         "--output", str(tmp_path / "vocab.txt")],
        capture_output=True, text=True, cwd=root,
    )
    assert r2.returncode == 0, r2.stderr
    vocab = open(tmp_path / "vocab.txt").read().split()
    assert "好" in vocab


def test_checkpoint_robustness(tmp_path):
    """Non-epoch files matching ep-*.pkg are ignored; cleanup tolerates
    concurrent removal; num=0 averaging is rejected; a failed async write
    is re-raised at the next wait() instead of being swallowed."""
    import pickle

    import pytest as _pytest

    from openasr_tpu.utils.checkpoint import (
        AsyncCheckpointer,
        average_last_ckpts,
        cleanup_ckpt,
        epoch_checkpoints,
    )

    for i in (1, 2, 3):
        with open(tmp_path / f"ep-{i:04d}.pkg", "wb") as f:
            pickle.dump({"components": {"w": np.ones((2,), np.float32) * i}},
                        f)
    # a hand-copied non-numbered file must not crash the scan
    (tmp_path / "ep-best.pkg").write_bytes(b"junk")
    paths = epoch_checkpoints(str(tmp_path))
    assert [p[-8:] for p in paths] == ["0001.pkg", "0002.pkg", "0003.pkg"]

    with _pytest.raises(ValueError, match="num must be >= 1"):
        average_last_ckpts(str(tmp_path), 0, str(tmp_path / "avg0.pkg"))

    # racing remover: file vanishes between glob and remove
    (tmp_path / "ep-0001.pkg").unlink()
    cleanup_ckpt(str(tmp_path), 1)  # must not raise despite the gone file
    assert not (tmp_path / "ep-0002.pkg").exists()
    assert (tmp_path / "ep-0003.pkg").exists()

    ck = AsyncCheckpointer()
    ck.save({"x": np.zeros(1)}, str(tmp_path / "nodir" / "last.pkg"))
    with _pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ck.wait()
    ck.wait()  # error is cleared after being raised once
