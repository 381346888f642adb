"""SPMD partitioning for the Pallas kernel entry points.

Without an explicit rule, GSPMD/Shardy treat a Mosaic custom call as an
opaque op: every sharded operand is all-gathered, the kernel runs
replicated on full arrays on every chip, and the result is replicated —
measured on an 8-device mesh this inserted 32 all-gathers around one
flash-attention call and would erase multi-chip scaling whenever a Pallas
path is active.  (The mesh-parallel CPU test suite never sees this
because the kernels are TPU-gated and the XLA fallback paths partition
fine — exactly the kind of hole that only shows up on a real pod.)

`kernel_partition` wraps a kernel entry (pure arrays in / arrays out)
with `jax.experimental.custom_partitioning`: the caller labels every
dimension with a factor name and says which factors are legal to shard
(for the attention/fbank/layer-norm kernels: the embarrassingly-parallel
batch/head/row dims).  Shardings on those dims pass through and the
kernel simply runs on its local shard (the pallas_call wrappers all
compute their grids from runtime shapes, so no further plumbing is
needed); shardings suggested on any other dim (e.g. the time axis, which
the online-softmax recurrence couples) are stripped, and the partitioner
inserts the reshard around the kernel instead of inside it.
"""

from __future__ import annotations

from typing import Dict, Sequence, Set, Tuple

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _axis_assignment(
    specs: Sequence[Tuple[str, ...]],
    shapes,
    shardable: Set[str],
) -> Dict[str, object]:
    """Map each shardable factor to the mesh axis (or axis tuple) the
    partitioner suggested for any dim labeled with it."""
    assign: Dict[str, object] = {}
    for spec, shape in zip(specs, shapes):
        sharding = getattr(shape, "sharding", None)
        pspec = getattr(sharding, "spec", None)
        if pspec is None:
            continue
        for j, factor in enumerate(spec):
            if factor not in shardable or j >= len(pspec):
                continue
            axis = pspec[j]
            if axis is not None and factor not in assign:
                assign[factor] = axis
    return assign


def _build_sharding(mesh, spec: Tuple[str, ...], assign) -> NamedSharding:
    return NamedSharding(
        mesh, P(*(assign.get(factor) for factor in spec))
    )


def kernel_partition(
    fn,
    in_specs: Sequence[Tuple[str, ...]],
    out_specs: Sequence[Tuple[str, ...]],
    shardable: Set[str],
    seed_arg: "int | None" = None,
):
    """Wrap kernel entry `fn` so SPMD partitioning runs it per-shard.

    in_specs / out_specs: one tuple of factor names per array, one name
    per dimension (tuple results only; a single-array result should be
    passed as a 1-tuple and unwrapped by the caller).
    shardable: factor names whose dims the kernel may run sharded on.
    seed_arg: index of a uint32 RNG-seed operand.  Kernels hash dropout
    masks from SHARD-LOCAL indices (program_id / local head count), so
    with a replicated seed every chip would regenerate the SAME masks for
    its local rows — correlated dropout across the global batch.  The
    per-shard lowering folds the shard's mesh position (lax.axis_index
    over the axes the shardable dims landed on) into the seed, which the
    kernels' murmur-style avalanche hash then decorrelates; forward and
    backward see the identical perturbed seed, so mask agreement is
    preserved."""
    cp = custom_partitioning(fn)
    rule = (
        ", ".join(" ".join(s) for s in in_specs)
        + " -> "
        + ", ".join(" ".join(s) for s in out_specs)
    )

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        assign = _axis_assignment(in_specs, arg_shapes, shardable)
        flat = tuple(
            _build_sharding(mesh, spec, assign) for spec in out_specs
        )
        return flat if len(flat) > 1 else flat[0]

    def partition(mesh, arg_shapes, result_shape):
        res_shapes = (
            result_shape
            if isinstance(result_shape, (list, tuple))
            else [result_shape]
        )
        assign = _axis_assignment(
            tuple(in_specs) + tuple(out_specs),
            tuple(arg_shapes) + tuple(res_shapes),
            shardable,
        )
        arg_shardings = tuple(
            _build_sharding(mesh, spec, assign) for spec in in_specs
        )
        flat = tuple(
            _build_sharding(mesh, spec, assign) for spec in out_specs
        )
        out_shardings = flat if len(flat) > 1 else flat[0]

        lower_fn = fn
        if seed_arg is not None:
            axes: list = []
            for factor in sorted(shardable):
                ax = assign.get(factor)
                if ax is None:
                    continue
                axes.extend(ax if isinstance(ax, tuple) else [ax])
            if axes:
                import jax.numpy as jnp

                def lower_fn(*args):
                    shard_id = jnp.zeros((), jnp.uint32)
                    for ax in axes:
                        shard_id = shard_id * jnp.uint32(0x9E3779B9) + (
                            jax.lax.axis_index(ax).astype(jnp.uint32)
                        )
                    args = list(args)
                    args[seed_arg] = (
                        args[seed_arg].astype(jnp.uint32)
                        + shard_id * jnp.uint32(0x85EBCA6B)
                    )
                    return fn(*args)

        return mesh, lower_fn, out_shardings, arg_shardings

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
    )
    return cp


def maybe_partition(fn, in_specs, out_specs, shardable, seed_arg=None):
    """kernel_partition, applied only when SPMD partitioning is enabled
    (kernels.set_spmd_partitioning — flipped on by make_mesh for >1-device
    meshes).  On a single device the wrapper's custom-call boundary costs
    ~0.5 ms/step (measured on the flagship bench) and buys nothing."""
    from openasr_tpu import kernels

    if not kernels.spmd_partitioning_enabled():
        return fn
    return kernel_partition(fn, in_specs, out_specs, shardable, seed_arg)
