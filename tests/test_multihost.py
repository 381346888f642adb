"""Multi-host (simulated DCN) integration: two OS processes, 4 virtual CPU
devices each, one global 8-device mesh with gloo cross-process collectives.

This executes the REAL `--distributed` code path (bin/train.py calls
`jax.distributed.initialize`; here the worker does the same with explicit
coordinates): per-host batch slices assembled into global arrays
(parallel/mesh.py:_shard_batch_multihost, including cross-host padded-shape
reconciliation), cross-host gradient all-reduce inserted by GSPMD, and
host-0-only checkpoint writes with collective packaging.  Parity: the
2-process run must produce exactly the same parameters as a single-process
run over the identical global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class
from openasr_tpu.parallel import make_mesh, shard_batch
from openasr_tpu.solvers import array_fields, get_solver_class

from test_train_e2e import model_config


def global_batch(b=16, t=48, d=20, u=6, vocab=8):
    """Deterministic global batch; the LAST b/2 rows (host 1's slice) carry
    no content past frame 40, so host 1 can legitimately collate them at a
    smaller padded T."""
    rng = np.random.RandomState(42)
    feats = rng.randn(b, t, d).astype(np.float32)
    feat_lengths = np.linspace(t // 2, t, b).astype(np.int32)
    feat_lengths[b // 2:] = np.linspace(20, 40, b - b // 2).astype(np.int32)
    for i in range(b):
        feats[i, feat_lengths[i]:] = 0.0
    paddings = np.zeros((b, u), np.float32)
    paddings[:, u - 2:] = 1.0
    return {
        "feats": feats,
        "feat_lengths": feat_lengths,
        "ids": rng.randint(3, vocab - 1, (b, u)).astype(np.int32),
        "labels": rng.randint(3, vocab - 1, (b, u)).astype(np.int32),
        "paddings": paddings,
    }


def training_config(exp_dir):
    return {
        "num_epoch": 1, "exp_dir": exp_dir,
        "print_inteval": 1000, "accumulate_grad_batch": 1,
        "init_lr": 1e-3, "optimtype": "adam", "grad_max_norm": 5.0,
        "label_smooth": 0.1, "lambda_ctc": 0.5,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 20,
                         "d_model": 32},
    }


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_parity(tmp_path):
    port = _free_port()
    outdir = str(tmp_path)
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    try:
        outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    # both hosts hold identical final parameters
    p0 = np.load(os.path.join(outdir, "params_0.npz"))
    p1 = np.load(os.path.join(outdir, "params_1.npz"))
    assert sorted(p0.files) == sorted(p1.files)
    for k in p0.files:
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=k)

    # host 0 (and only host 0) wrote the checkpoint
    assert os.path.exists(os.path.join(outdir, "exp", "last.pkg"))

    # parity with a single-process run over the identical global batch
    mesh = make_mesh(jax.devices("cpu")[:8], model=1)
    cfg = model_config(8)
    model = get_model_class(cfg.type).create_model(cfg)
    solver = get_solver_class(cfg.type)(
        model, Config(training_config(str(tmp_path / "exp_single"))),
        [], [], mesh=mesh,
    )
    params, opt_state = model.params, solver.opt_state
    for i in range(2):
        arrays = shard_batch(array_fields(global_batch()), mesh)
        params, opt_state, loss, _ = solver._train_step(
            params, opt_state, arrays, jax.random.PRNGKey(100 + i)
        )
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            jax.device_get(params)
        )[0]
    }
    assert sorted(flat) == sorted(p0.files)
    for k in p0.files:
        np.testing.assert_allclose(
            p0[k], flat[k], rtol=2e-3, atol=2e-5, err_msg=k
        )


@pytest.mark.slow
def test_one_sided_preemption_stops_both_hosts(tmp_path):
    """SIGTERM delivered to ONE host must stop the whole job: the stop
    decision is a cross-host collective OR (Solver._should_stop), so the
    unsignaled host neither hangs in the next batch-assembly collective
    nor trains on alone, and both hosts join the collective checkpoint
    packaging.  A hang here -> the 300 s timeout fails the test."""
    port = _free_port()
    outdir = str(tmp_path)
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), outdir,
             "preempt"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    try:
        outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert "preempt done" in out
    # the preemption snapshot was written (by host 0's collective save)
    assert os.path.exists(os.path.join(outdir, "exp", "last.pkg"))
