"""Sequence parallelism (Megatron-style, as pure GSPMD placement) on the
virtual 8-device CPU mesh.

Under tensor parallelism the residual stream between attention and FFN
blocks is replicated over the 'model' axis; `training.sequence_parallel`
(default on) pins it to T-sharding there instead
(parallel/mesh.py:shard_time), so residual adds / dropout / LayerNorm
hold T/|model| rows per chip.  Guarantees:

  1. Mechanism: shard_time constrains [B, T, ...] activations to
     P(data, model, ...) inside a trace scoped by `sequence_parallel`,
     and stays a no-op outside one / on indivisible shapes.
  2. Semantics: train steps with it on, off, and on a single device
     produce identical parameters — placement, not math.
"""

import numpy as np

import jax

from openasr_tpu.parallel import make_mesh, shard_batch
from openasr_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    sequence_parallel,
    shard_time,
)
from openasr_tpu.solvers import array_fields

from test_tensor_parallel import _make_batch, _make_solver, _params_allclose


def test_shard_time_mechanism():
    # NB: fresh `lambda` per jit — jax caches traces on the underlying
    # function identity, and shard_time bakes its scope at TRACE time
    # (which is exactly why Solver scopes every step call with _with_sp)
    mesh = make_mesh(jax.devices("cpu")[:8], model=2)
    x = np.ones((8, 16, 32), np.float32)

    with sequence_parallel(mesh):
        out = jax.jit(lambda a: shard_time(a))(x)
    assert tuple(out.sharding.spec)[:2] == (DATA_AXIS, MODEL_AXIS), (
        out.sharding
    )

    # outside the scope: identity (output sharding has no model axis)
    out = jax.jit(lambda a: shard_time(a))(np.ones((8, 16, 32), np.float32))
    spec = tuple(getattr(out.sharding, "spec", ()) or ())
    assert MODEL_AXIS not in spec

    with sequence_parallel(mesh):
        # T=15 not divisible by tp=2: no-op, no error
        out = jax.jit(lambda a: shard_time(a))(
            np.ones((8, 15, 32), np.float32)
        )
        spec = tuple(getattr(out.sharding, "spec", ()) or ())
        assert MODEL_AXIS not in spec
        # decode-step shapes [B, 1, D] skip too
        out = jax.jit(lambda a: shard_time(a))(
            np.ones((8, 1, 32), np.float32)
        )
        spec = tuple(getattr(out.sharding, "spec", ()) or ())
        assert MODEL_AXIS not in spec


def test_sequence_parallel_train_parity_on_off(tmp_path):
    batch = _make_batch()
    rng = jax.random.PRNGKey(11)
    cpus = jax.devices("cpu")
    runs = {}
    for tag, mesh, sp in (
        ("single", make_mesh(cpus[:1], model=1), True),
        ("tp2_on", make_mesh(cpus[:8], model=2), True),
        ("tp2_off", make_mesh(cpus[:8], model=2), False),
    ):
        solver, model = _make_solver(mesh, tmp_path, f"sp_{tag}")
        if not sp:
            solver._sp_mesh = None
            solver._train_step = solver._build_train_step()
        elif tag == "tp2_on":
            assert solver._sp_mesh is mesh  # the default under TP
        arrays = shard_batch(array_fields(batch), mesh)
        params, opt_state = model.params, solver.opt_state
        for k in range(2):
            params, opt_state, loss, _ = solver._train_step(
                params, opt_state, arrays, jax.random.fold_in(rng, k)
            )
        runs[tag] = (
            float(loss),
            jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
        )
    ref_loss, ref_params = runs["single"]
    assert np.isfinite(ref_loss)
    for tag in ("tp2_on", "tp2_off"):
        loss, params = runs[tag]
        assert np.isclose(loss, ref_loss, rtol=2e-4), (tag, loss, ref_loss)
        _params_allclose(params, ref_params, rtol=2e-3, atol=2e-5, tag=tag)
