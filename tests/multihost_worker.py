"""Worker process for the multi-host (simulated DCN) integration test.

Run as: python multihost_worker.py <pid> <nprocs> <port> <outdir>

Each process gets 4 virtual CPU devices; together they form one global
8-device mesh with gloo cross-process collectives — the same code path a
real multi-host TPU pod takes (`--distributed`), minus the ICI/DCN fabric.
Host `pid` loads only its own half of the global batch (with a DIFFERENT
time padding than the other host, to exercise shard_batch's cross-host
shape reconciliation), runs two train steps, saves a checkpoint (host 0
writes; packaging is collective), and dumps its view of the params.
"""

import os
import sys

pid, nprocs, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
mode = sys.argv[5] if len(sys.argv) > 5 else "train"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nprocs,
    process_id=pid,
)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
cpus = jax.devices("cpu")
# the default device must be one of THIS host's devices — cpus[0] is
# host 0's first device globally, which is non-addressable from host 1.
# NB: jax.process_index() consults the default backend (under a foreign
# accelerator plugin that can be a single-process tunnel answering 0 on
# every host), so local devices come from jax.local_devices explicitly.
local_cpus = jax.local_devices(backend="cpu")
jax.config.update("jax_default_device", local_cpus[0])

from openasr_tpu.models import get_model_class  # noqa: E402
from openasr_tpu.parallel import make_mesh, shard_batch  # noqa: E402
from openasr_tpu.solvers import array_fields, get_solver_class  # noqa: E402
from openasr_tpu.config import Config  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_train_e2e import model_config  # noqa: E402
from test_multihost import global_batch, training_config  # noqa: E402

assert len(cpus) == 4 * nprocs, cpus
mesh = make_mesh(cpus, model=1)
assert mesh.shape == {"data": 4 * nprocs, "model": 1}

cfg = model_config(8)
model = get_model_class(cfg.type).create_model(cfg)
solver = get_solver_class(cfg.type)(
    model, Config(training_config(os.path.join(outdir, "exp"))),
    [], [], mesh=mesh,
)

batch = global_batch()
b = batch["feats"].shape[0]
k = b // nprocs
local = {key: v[pid * k : (pid + 1) * k] for key, v in batch.items()}

if mode == "preempt":
    # One-sided preemption: ONLY host 0 receives the stop signal.  The
    # collective stop check (Solver._should_stop) must propagate it so
    # host 1 neither hangs in the next batch-assembly collective nor
    # keeps training alone; both hosts then join the collective
    # checkpoint packaging and exit cleanly.
    solver.tr_loader = [dict(local) for _ in range(3)]
    solver.cv_loader = []
    if pid == 0:
        solver._stop_requested = True
    solver.train()
    if hasattr(solver, "_ckpt"):
        solver._ckpt.wait()
    print(f"worker {pid}: preempt done step={solver.step}", flush=True)
    sys.exit(0)
if pid == 1:
    # this host's collate saw shorter utterances: its padded T is one
    # quantization bucket below the other host's — shard_batch must
    # reconcile before assembling the global array
    local["feats"] = local["feats"][:, :40]

params = model.params
opt_state = solver.opt_state
for i in range(2):
    arrays = shard_batch(array_fields(local), mesh)
    rng = jax.random.PRNGKey(100 + i)
    params, opt_state, loss, _ = solver._train_step(
        params, opt_state, arrays, rng
    )
solver.model.params = params
solver.opt_state = opt_state
solver.step = 2
solver.save(os.path.join(outdir, "exp", "last.pkg"))
if hasattr(solver, "_ckpt"):
    solver._ckpt.wait()

from openasr_tpu.models import _to_numpy  # noqa: E402

host_params = _to_numpy(params)
flat = {
    "/".join(str(getattr(p, "key", p)) for p in path): leaf
    for path, leaf in jax.tree_util.tree_flatten_with_path(host_params)[0]
}
np.savez(os.path.join(outdir, f"params_{pid}.npz"), **flat)
print(f"worker {pid}: done loss={float(loss):.5f}", flush=True)
