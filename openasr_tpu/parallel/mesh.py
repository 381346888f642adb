"""Device mesh + sharding rules: the framework's distributed backend.

This replaces the reference's entire parallelism story — single-process
`torch.nn.DataParallel` with replica scatter/gather per forward
(reference: src/train.py:132-134, src/solvers/__init__.py:16-19) — with
JAX GSPMD over a (data, model) mesh:

  * batches are sharded on the 'data' axis (ICI all-reduce for gradients,
    inserted by XLA);
  * parameters are optionally tensor-sharded on the 'model' axis
    (attention heads / FFN hidden), replicated otherwise;
  * multi-host runs use the same code after `jax.distributed.initialize`.

The samplers' batch-divisibility knob (reference: samplers.py:21-31, ngpu)
maps to the mesh's data-axis size.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def _default_devices():
    """Devices of the platform computations actually target.  Plain
    `jax.devices()` is wrong under the experimental 'axon' TPU plugin,
    which stays the default backend even when JAX_PLATFORMS=cpu /
    jax_default_device pins CPU — building the mesh from it would silently
    route every jitted step through the device tunnel."""
    from openasr_tpu.kernels import default_platform

    try:
        return jax.devices(default_platform())
    except RuntimeError:
        return jax.devices()


def make_mesh(
    devices=None, data: Optional[int] = None, model: int = 1
) -> Mesh:
    """Build a (data, model) mesh over the given devices (default: all
    devices of the effective default platform)."""
    devices = list(devices if devices is not None else _default_devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put each array field with batch-dim sharding; non-arrays
    (uttids) pass through."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim"):
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim))
        else:
            out[k] = v
    return out


# ------------------------------------------------------- parameter sharding

def _spec_for(path: tuple, leaf) -> P:
    """Tensor-parallel partition rules by param-tree path.

    Megatron-style: attention head dims and FFN hidden dims shard over
    'model'; embeddings shard over the vocab dim; everything else
    replicates.  XLA/GSPMD inserts the matching collectives.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    ndim = getattr(leaf, "ndim", 0)

    if "self_attn" in joined or "cross_attn" in joined:
        if names[-1] == "kernel":
            if any(n in ("q", "k", "v") for n in names):
                # DenseGeneral [D, H, Dh] -> shard heads
                return P(*([None] * (ndim - 2)), MODEL_AXIS, None)
            if "out" in names:
                # DenseGeneral [H, Dh, D] -> shard heads
                return P(MODEL_AXIS, *([None] * (ndim - 1)))
        if names[-1] == "bias" and any(n in ("q", "k", "v") for n in names):
            return P(*([None] * (ndim - 2)), MODEL_AXIS, None) if ndim >= 2 else P(MODEL_AXIS)
    if "ffn" in joined or "linear1" in joined or "linear2" in joined:
        if "linear1" in names and names[-1] == "kernel":
            return P(None, MODEL_AXIS)
        if "linear1" in names and names[-1] == "bias":
            return P(MODEL_AXIS)
        if "linear2" in names and names[-1] == "kernel":
            return P(MODEL_AXIS, None)
    if names[-1] == "embedding" and ndim == 2:
        return P(MODEL_AXIS, None)
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for the param tree (TP over 'model' when the
    mesh has a model axis > 1, else fully replicated)."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
