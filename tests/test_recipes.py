"""Recipe-level CPU smoke tests: run egs/*/train_cpu.sh + infer_cpu.sh the
way a user would (the reference's *_test.yaml configs + train_cpu.sh were
its de-facto integration tests, e.g. egs/hkust/train_cpu.sh).

Every corpus's CPU path runs in the default suite (the reference ships
train_cpu.sh/infer_cpu.sh for each of these corpora); set
OPENASR_RECIPES_FAST=1 to run only the representative hkust recipe when
iterating locally.
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALL_RECIPES = [
    # (corpus, train script, infer script or None)
    ("hkust", "train_cpu.sh", "infer_cpu.sh"),
    ("aishell1", "train_cpu.sh", "infer_cpu.sh"),
    ("callhome_hkust", "train_cpu.sh", "infer_cpu.sh"),
    ("IPA2char", "train_cpu.sh", None),
    ("wav2vec", "train_cpu.sh", "infer_cpu.sh"),
]

FAST = os.environ.get("OPENASR_RECIPES_FAST") == "1"
RECIPES = ALL_RECIPES[:1] if FAST else ALL_RECIPES


def run_recipe(corpus, script, tmp_path, args=()):
    workdir = tmp_path / corpus
    if not workdir.exists():
        shutil.copytree(os.path.join(REPO, "egs", corpus), workdir)
    env = dict(
        os.environ,
        MAIN_ROOT=REPO,
        JAX_PLATFORMS="cpu",
        OPENASR_DEVICE="cpu",
    )
    result = subprocess.run(
        ["bash", script, *args], cwd=workdir, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert result.returncode == 0, (
        f"{corpus}/{script} failed:\n{result.stdout[-2000:]}\n"
        f"{result.stderr[-3000:]}"
    )
    return workdir, result


@pytest.mark.parametrize("corpus,train,infer", RECIPES)
def test_recipe_cpu_smoke(corpus, train, infer, tmp_path):
    workdir, _ = run_recipe(corpus, train, tmp_path)
    exps = list((workdir / "exp").iterdir())
    assert exps, "training produced no exp dir"
    assert any((e / "last.pkg").exists() for e in exps), (
        "no checkpoint written"
    )
    if infer:
        workdir, result = run_recipe(corpus, infer, tmp_path)
        exp = next(e for e in (workdir / "exp").iterdir()
                   if (e / "hyp.txt").exists())
        hyp_lines = open(exp / "hyp.txt").read().strip().splitlines()
        assert hyp_lines, "decode produced no hypotheses"
        assert (exp / "score.txt").exists(), "eval_result.sh wrote no report"
        assert "SYSTEM SUMMARY" in open(exp / "score.txt").read()


def test_recipe_cpu_smoke_moe(tmp_path):
    """The MoE mini-config trains through the real recipe path
    (train_cpu.sh with an explicit config) — router, glu experts, and
    the aux loss all through the CLI, matching the user workflow of
    egs/aishell1/configs/conv-ctc-transformer-moe.yaml."""
    if FAST:
        pytest.skip("OPENASR_RECIPES_FAST=1")
    workdir, result = run_recipe(
        "aishell1", "train_cpu.sh", tmp_path,
        args=("configs/conv-ctc-transformer-moe_test.yaml",),
    )
    exp = workdir / "exp" / "conv-ctc-transformer-moe-test"
    assert (exp / "last.pkg").exists()
    # the checkpoint carries the expert tables (glu: incl. w_gate)
    import jax

    from openasr_tpu.utils.checkpoint import load_package

    pkg = load_package(str(exp / "last.pkg"))
    flat = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(
            pkg["model"]["components"]
        )[0]
    }
    assert any("moe_ffn" in k and "w_gate" in k for k in flat), flat
