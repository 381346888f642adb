"""ZeRO-1 optimizer-state sharding on the virtual 8-device CPU mesh.

Three guarantees (extends the reference's no-scale-story DataParallel,
src/train.py:132-134, with the optimizer-state-sharding recipe):

  1. Placement: with training.zero1 (default on), Adam moment leaves are
     sharded over the data axis — each chip stores 1/|data| of the
     optimizer state — composing with tensor-parallel shardings, while
     step counters stay replicated.
  2. Semantics: zero1 is a pure placement change — train steps produce
     identical parameters with it on, off, and on a single device.
  3. Durability: save/restore lands the moments back on their zero1
     placement and the next step is parity-identical (covered generically
     by test_tensor_parallel.py::test_tensor_parallel_resume, which runs
     with the zero1 default; the explicit spec check lives here).
"""

import numpy as np

import jax

from openasr_tpu.parallel import make_mesh, shard_batch
from openasr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, zero1_sharding
from openasr_tpu.solvers import array_fields

from test_tensor_parallel import _make_batch, _make_solver, _params_allclose


def _moment_tree(opt_state):
    """The fused-adam moment trees (state layout mirrors optax)."""
    state = opt_state
    while not hasattr(state, "mu"):
        state = state.inner_state  # masked/apply_if_finite wrappers
    return state.mu, state.nu, state.count


def test_zero1_spec_unit():
    mesh = make_mesh(jax.devices("cpu")[:8], model=1)
    # largest divisible dim wins
    leaf = jax.device_put(np.zeros((6, 32, 16), np.float32))
    sh = zero1_sharding(leaf, mesh)
    assert tuple(sh.spec) == (None, DATA_AXIS, None)
    # scalars and indivisible shapes keep their placement
    assert zero1_sharding(jax.device_put(np.float32(0.0)), mesh) is None
    assert zero1_sharding(
        jax.device_put(np.zeros((3, 5), np.float32)), mesh
    ) is None
    # a 1-wide data axis is a no-op
    m1 = make_mesh(jax.devices("cpu")[:1], model=1)
    assert zero1_sharding(jax.device_put(np.zeros(64)), m1) is None


def test_zero1_moments_sharded_over_data(tmp_path):
    mesh = make_mesh(jax.devices("cpu")[:8], model=1)
    solver, model = _make_solver(mesh, tmp_path, "z1_dp8")
    assert solver.zero1
    mu, nu, count = _moment_tree(solver.opt_state)

    for tree in (mu, nu):
        sharded = total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            total += 1
            spec = tuple(leaf.sharding.spec)
            if any(d % 8 == 0 for d in leaf.shape):
                # zero1 shards the largest divisible dim of every
                # shardable moment leaf
                assert DATA_AXIS in spec, (jax.tree_util.keystr(path), spec)
                sharded += 1
                # each chip stores 1/8 of this leaf
                local = leaf.addressable_shards[0].data
                assert local.size * 8 == leaf.size, jax.tree_util.keystr(path)
        assert sharded >= total * 0.8, (sharded, total)
    assert tuple(count.sharding.spec) == ()  # counter replicated


def test_zero1_composes_with_tensor_parallel(tmp_path):
    mesh = make_mesh(jax.devices("cpu")[:8], model=2)
    solver, model = _make_solver(mesh, tmp_path, "z1_tp")
    mu, _, _ = _moment_tree(solver.opt_state)
    flat = {
        jax.tree_util.keystr(p): tuple(leaf.sharding.spec)
        for p, leaf in jax.tree_util.tree_flatten_with_path(mu)[0]
    }
    both = [
        k for k, spec in flat.items()
        if MODEL_AXIS in spec and DATA_AXIS in spec
    ]
    # TP-sharded FFN/attention moments must ALSO shard over data
    assert any("linear1" in k for k in both), both
    assert any("self_attn" in k for k in both), both


def test_zero1_train_parity_on_off(tmp_path):
    batch = _make_batch()
    rng = jax.random.PRNGKey(7)
    cpus = jax.devices("cpu")
    runs = {}
    for tag, mesh, zero1 in (
        ("single", make_mesh(cpus[:1], model=1), True),
        ("dp8_on", make_mesh(cpus[:8], model=1), True),
        ("dp8_off", make_mesh(cpus[:8], model=1), False),
    ):
        solver, model = _make_solver(mesh, tmp_path, f"z1p_{tag}")
        if solver.zero1 != zero1:
            solver.zero1 = zero1
            solver.opt_state = solver._place_opt_state(
                solver.tx.init(model.params)
            )
            solver._train_step = solver._build_train_step()
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
    for tag in ("dp8_on", "dp8_off"):
        loss, params = runs[tag]
        assert np.isclose(loss, ref_loss, rtol=2e-4), (tag, loss, ref_loss)
        _params_allclose(params, ref_params, rtol=2e-3, atol=2e-5, tag=tag)
