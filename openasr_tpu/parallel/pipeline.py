"""GPipe pipeline parallelism for homogeneous transformer stacks.

The reference has no pipeline story at all (single-process DataParallel,
src/train.py:132-134); this is TPU-native scale-out for models whose
layer stack outgrows one chip: stages are contiguous layer groups laid
out over the mesh's 'pipe' axis, microbatches stream through a
fill/compute/drain schedule, and the inter-stage hop is one `ppermute`
over ICI.  Everything is expressed with functional transforms —
`jax.shard_map` manual over ONLY the pipe axis (data/model axes stay
GSPMD-managed inside, so pp composes with dp/tp), `lax.scan` over the
schedule so autodiff derives the reverse-schedule backward, and
`jax.checkpoint` per stage for GPipe's O(microbatch) activation memory.

Layout contract: layer parameters arrive STACKED — a single layer-shaped
pytree whose leaves carry a leading [L] dim (`stack_layer_params`
builds one from the flax per-layer `layer{i}` tree and
`unstack_layer_params` restores it, so checkpoints stay in the
reference-compatible per-layer layout).  Inside the executor the stack
reshapes to [S, L/S, ...] sharded over 'pipe'; each stage scans its
L/S layers sequentially.

Schedule: with S stages and M microbatches, T = M + S - 1 steps; at
step t stage s computes microbatch (t - s) when 0 <= t - s < M and
garbage otherwise (the fill/drain bubble).  Garbage never reaches the
output — the final gather takes stage S-1's steps [S-1, M+S-1) — so its
gradient contribution is exactly zero and no masking is needed in the
compute.  Pipeline bubble fraction = (S-1)/(M+S-1): pick M >= 4*S.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from openasr_tpu.parallel.mesh import (
    DATA_AXIS,
    PIPE_AXIS,
    sequence_parallel,
)

LayerApply = Callable[[Any, jnp.ndarray, Any, Optional[jax.Array]], jnp.ndarray]

# ------------------------------------------------------- runtime context
#
# Like sequence parallelism (mesh.py:_SEQ_MESH), the pipeline mesh is a
# trace-time context rather than a threaded argument: flax modules deep in
# the model read it when the solver's jitted step traces, and solvers on
# different meshes each scope their own calls.

_PIPE_CTX: "Optional[tuple]" = None  # (mesh, n_microbatch)


class pipeline_scope:
    """Scope the (mesh, n_microbatch) pipeline context to one trace."""

    def __init__(self, ctx: Optional[tuple]):
        self.ctx = ctx

    def __enter__(self):
        global _PIPE_CTX
        self.prev = _PIPE_CTX
        _PIPE_CTX = self.ctx

    def __exit__(self, *exc):
        global _PIPE_CTX
        _PIPE_CTX = self.prev


def pipeline_context() -> Optional[tuple]:
    return _PIPE_CTX


def stack_layer_params(params: dict, prefix: str = "layer"):
    """Stack the per-layer subtrees `params[f'{prefix}{i}']` into one
    layer-shaped tree with leading [L] leaves.  Returns (stacked, L)."""
    pat = re.compile(re.escape(prefix) + r"(\d+)$")
    names = sorted(
        (k for k in params if pat.match(k)),
        key=lambda k: int(pat.match(k).group(1)),
    )
    if not names:
        raise ValueError(
            f"no '{prefix}<i>' layer subtrees among {sorted(params)}"
        )
    idx = [int(pat.match(k).group(1)) for k in names]
    if idx != list(range(len(names))):
        raise ValueError(f"non-contiguous layer indices {idx}")
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *(params[k] for k in names)
    )
    return stacked, len(names)


def unstack_layer_params(stacked, n_layers: int, prefix: str = "layer") -> dict:
    """Inverse of `stack_layer_params` (checkpoint-compatible layout)."""
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda l, i=i: l[i], stacked)
        for i in range(n_layers)
    }


def gpipe_apply(
    layer_apply: LayerApply,
    stacked_params,
    x: jnp.ndarray,
    aux,
    mesh: Mesh,
    n_microbatch: int,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
):
    """Run a stacked homogeneous layer sequence as a GPipe pipeline.

    layer_apply(layer_params, h, aux, rng) -> h: one layer, pure.  `aux`
    is a pytree of per-example arrays (leading batch dim — e.g. the
    kv_lengths the attention padding mask needs) that travels WITH each
    microbatch through the stages, unchanged.  `rng` (optional) is folded
    with (schedule step, stage, layer-in-stage) so dropout masks
    decorrelate across every axis of the schedule; mask ASSIGNMENT
    therefore differs from the sequential stack — semantics (iid
    Bernoulli per activation), not bit patterns, are preserved.
    `remat` wraps each stage in jax.checkpoint: activations inside a
    stage are rematerialized in the backward, leaving O(M) stage
    boundaries as the only pipeline-held state.

    x: [B, T, ...] with B % n_microbatch == 0; returns [B, T, ...].
    """
    if PIPE_AXIS not in mesh.shape:
        raise ValueError(f"mesh {mesh.shape} has no '{PIPE_AXIS}' axis")
    n_stages = mesh.shape[PIPE_AXIS]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    batch = x.shape[0]
    if batch % n_microbatch != 0:
        raise ValueError(f"batch {batch} not divisible by M={n_microbatch}")
    m_size = batch // n_microbatch
    M, S = n_microbatch, n_stages

    xm = x.reshape(M, m_size, *x.shape[1:])
    auxm = jax.tree_util.tree_map(
        lambda a: a.reshape(M, m_size, *a.shape[1:]), aux
    )
    # keep each MICROBATCH data-parallel: the batch arrived sharded over
    # 'data' on dim 0; after the [M, mb, ...] reshape pin the mb dim to
    # 'data' so every pipeline step still runs data-parallel inside the
    # stage (GSPMD inserts one reshard at pipeline entry).  Skipped when
    # mb doesn't divide — correctness never depends on it.
    data = dict(mesh.shape).get(DATA_AXIS, 1)
    if data > 1 and m_size % data == 0:
        def pin(a):
            spec = P(None, DATA_AXIS, *([None] * (a.ndim - 2)))
            return jax.lax.with_sharding_constraint(
                a, jax.sharding.NamedSharding(mesh, spec)
            )
        xm = pin(xm)
        auxm = jax.tree_util.tree_map(pin, auxm)
    staged = jax.tree_util.tree_map(
        lambda l: l.reshape(S, n_layers // S, *l.shape[1:]), stacked_params
    )
    use_rng = rng is not None
    rng_in = rng if use_rng else jax.random.PRNGKey(0)

    def body(p_local, xm, auxm, rng_in):
        # p_local: [1, L/S, ...] — this stage's layer group
        p_stage = jax.tree_util.tree_map(lambda l: l[0], p_local)
        s = lax.axis_index(PIPE_AXIS)

        def apply_stage(h, aux_h, rng_t):
            def layer_body(carry, lp):
                i, hh = carry
                rr = (
                    jax.random.fold_in(rng_t, i) if use_rng else None
                )
                hh = layer_apply(lp, hh, aux_h, rr)
                return (i + 1, hh), None
            (_, h), _ = lax.scan(layer_body, (jnp.int32(0), h), p_stage)
            return h

        if remat:
            apply_stage = jax.checkpoint(apply_stage)

        perm = [(i, i + 1) for i in range(S - 1)]

        def step(carry, t):
            h_in, aux_in = carry
            m_idx = jnp.clip(t, 0, M - 1)
            x0 = lax.dynamic_index_in_dim(xm, m_idx, 0, keepdims=False)
            aux0 = jax.tree_util.tree_map(
                lambda a: lax.dynamic_index_in_dim(a, m_idx, 0, keepdims=False),
                auxm,
            )
            # stage 0 ingests microbatch t; later stages consume what the
            # previous stage handed over at the end of step t-1
            h = jnp.where(s == 0, x0.astype(h_in.dtype), h_in)
            aux_cur = jax.tree_util.tree_map(
                lambda a0, ai: jnp.where(s == 0, a0, ai), aux0, aux_in
            )
            rng_t = (
                jax.random.fold_in(jax.random.fold_in(rng_in, t), s)
                if use_rng
                else rng_in
            )
            y = apply_stage(h, aux_cur, rng_t)
            h_next = lax.ppermute(y, PIPE_AXIS, perm)
            aux_next = jax.tree_util.tree_map(
                lambda a: lax.ppermute(a, PIPE_AXIS, perm), aux_cur
            )
            return (h_next, aux_next), y

        init = (
            jnp.zeros(xm.shape[1:], xm.dtype),
            jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape[1:], a.dtype), auxm
            ),
        )
        _, ys = lax.scan(step, init, jnp.arange(M + S - 1))
        # stage S-1's steps [S-1, M+S-1) are microbatches [0, M); other
        # stages contribute zeros and the psum replicates the result over
        # the pipe axis (one output-sized collective, so out_specs stays
        # a plain replicated spec and downstream GSPMD code is untouched)
        valid = lax.dynamic_slice_in_dim(ys, S - 1, M, axis=0)
        out = lax.psum(
            jnp.where(s == S - 1, valid, jnp.zeros_like(valid)), PIPE_AXIS
        )
        return out

    # sequence-parallel constraints don't compose with the manual-over-
    # pipe region (the microbatch layout differs); suspend them for the
    # body's trace — the surrounding model code keeps its own.
    with sequence_parallel(None):
        out = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(PIPE_AXIS), P(), P(), P()),
            out_specs=P(),
            axis_names={PIPE_AXIS},
            check_vma=False,
        )(staged, xm, auxm, rng_in)
    return out.reshape(batch, *x.shape[1:])
