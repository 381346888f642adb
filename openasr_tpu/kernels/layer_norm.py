"""Pallas TPU fused LayerNorm (forward + custom-VJP backward).

XLA compiles LayerNorm's backward into separate reduction fusions per
norm site: the profiled flagship step spends ~0.1 ms per encoder layer in
`multiply_reduce_fusion`s that re-read the activations at ~80 GB/s to form
d(scale)/d(bias) (reductions over the batch*time axis, i.e. across the
MAJOR dims of a [B, T, D] tensor — a layout XLA's row reducers handle
poorly).  This kernel computes the whole backward — dx plus per-row-block
partial d(scale)/d(bias) — in ONE pass over (x, dy), so the activation is
read once at streaming bandwidth; the [n_blocks, D] partials are summed by
XLA (tiny).

Semantics match `flax.linen.LayerNorm(use_fast_variance=True)` exactly:
statistics in f32 (var = E[x^2] - E[x]^2), y cast back to the input dtype,
f32 scale/bias grads.  The reference normalizes through
torch.nn.LayerNorm (reference: src/third_party/transformer.py:254-408,
src/blocks/conv_layers.py:80-96); parity is asserted against the plain
flax/XLA formula in tests/test_layer_norm_kernel.py.

Routing lives in `models/layers.py:LayerNorm` (a drop-in replacement for
nn.LayerNorm with identical param names/shapes): the Pallas path is taken
on TPU for row counts where the kernel wins; everything else — CPU tests,
tiny per-decode-step shapes inside lax.scan — uses the plain XLA formula.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


from openasr_tpu.kernels._util import cdiv as _cdiv, round_up as _round_up


def _block_rows(n: int, d: int) -> int:
    """Row-block size: keep the f32 working set (a handful of [R, D]
    buffers) a few MB under the ~16 MB VMEM budget.  Prefer a block that
    divides `n` exactly — then no zero-padded copy of x/dy is needed
    (e.g. N = 64*127 rows takes R = 1016, not 1024)."""
    budget = 2 * 1024 * 1024  # bytes per f32 [R, D] buffer
    r = budget // max(4 * d, 1)
    r = _round_up(max(64, min(1024, r)), 8)
    for cand in range(r, 63, -8):
        if n % cand == 0:
            return cand
    return r


# ---------------------------------------------------------------------------
# kernels


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, mu_ref, rstd_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    rstd = jax.lax.rsqrt(var + eps)
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    y = (x - mu) * rstd * g + b
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu
    rstd_ref[...] = rstd


def _bwd_dx_kernel(x_ref, dy_ref, g_ref, mu_ref, rstd_ref, dx_ref):
    """dx only — the SPMD path.  dgamma/dbeta are plain column reductions
    computed in XLA by the vjp wrapper: keeping them out of the kernel
    lets the whole backward partition row-parallel (a per-block partials
    buffer would tie the output shape to the global block count, which
    differs between the global trace and the per-shard lowering)."""
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    rstd = rstd_ref[...]
    xhat = (x - mu_ref[...]) * rstd
    dxhat = dy * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _bwd_kernel_partials(x_ref, dy_ref, g_ref, mu_ref, rstd_ref,
                         dx_ref, dg_ref, db_ref):
    """Single-device path: dx plus per-block dgamma/dbeta partials in ONE
    pass over (x, dy) — the separate XLA reductions re-read both at
    ~80 GB/s."""
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    rstd = rstd_ref[...]
    xhat = (x - mu_ref[...]) * rstd
    dxhat = dy * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)
    # Per-block partials; padded rows contribute zero because dy is
    # zero-padded (and xhat stays finite: rstd = 1/sqrt(eps) on zero rows).
    # TPU blocks need sublane-dim 8, so the [D] partial is replicated
    # across 8 sublanes; the caller sums blocks and reads one row.
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy, axis=0, keepdims=True)
    dg_ref[...] = jnp.broadcast_to(dg, dg_ref.shape)
    db_ref[...] = jnp.broadcast_to(db, db_ref.shape)


# ---------------------------------------------------------------------------
# pallas_call wrappers (operate on zero-padded 2-D [N, D])


def _fwd_call(x2d, gamma, beta, eps, interpret):
    # Shapes, row-blocking, and padding all live INSIDE core: under SPMD
    # (kernels/partition.py) core runs on the local row shard, whose row
    # count — and therefore block size and padding — differ from the
    # global trace's.
    def core(x2d, g2, b2):
        n, d = x2d.shape
        r = _block_rows(n, d)
        npad = _round_up(n, r)
        xp = (
            jnp.pad(x2d, ((0, npad - n), (0, 0))) if npad != n else x2d
        )
        grid = (npad // r,)
        row_spec = pl.BlockSpec((r, d), lambda i: (i, 0))
        stat_spec = pl.BlockSpec((r, 1), lambda i: (i, 0))
        full_spec = pl.BlockSpec((1, d), lambda i: (0, 0))
        y, mu, rstd = pl.pallas_call(
            functools.partial(_fwd_kernel, eps=eps),
            grid=grid,
            in_specs=[row_spec, full_spec, full_spec],
            out_specs=[row_spec, stat_spec, stat_spec],
            out_shape=[
                jax.ShapeDtypeStruct((npad, d), x2d.dtype),
                jax.ShapeDtypeStruct((npad, 1), jnp.float32),
                jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            ],
            interpret=interpret,
        )(xp, g2, b2)
        return y[:n], mu[:n], rstd[:n]

    from openasr_tpu.kernels.partition import maybe_partition

    core_p = maybe_partition(
        core,
        in_specs=[("n", "d"), ("gone", "d"), ("gone", "d")],
        out_specs=[("n", "d"), ("n", "mone"), ("n", "sone")],
        shardable={"n"},
    )
    return core_p(x2d, gamma[None, :], beta[None, :])


def _bwd_call(x2d, dy, gamma, mu, rstd, eps, interpret):
    from openasr_tpu import kernels

    if not kernels.spmd_partitioning_enabled():
        return _bwd_call_partials(x2d, dy, gamma, mu, rstd, eps, interpret)

    def core(x2d, dy, g2, mu, rstd):
        n, d = x2d.shape
        r = _block_rows(n, d)
        npad = _round_up(n, r)
        if npad != n:
            pad = ((0, npad - n), (0, 0))
            x2d = jnp.pad(x2d, pad)
            dy = jnp.pad(dy, pad)
            mu = jnp.pad(mu, pad)
            rstd = jnp.pad(rstd, pad)  # zero rstd -> zero dx on pad rows
        grid = (npad // r,)
        row_spec = pl.BlockSpec((r, d), lambda i: (i, 0))
        stat_spec = pl.BlockSpec((r, 1), lambda i: (i, 0))
        full_spec = pl.BlockSpec((1, d), lambda i: (0, 0))
        dx = pl.pallas_call(
            _bwd_dx_kernel,
            grid=grid,
            in_specs=[row_spec, row_spec, full_spec, stat_spec, stat_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((npad, d), dy.dtype),
            interpret=interpret,
        )(x2d, dy, g2, mu, rstd)
        return dx[:n]

    from openasr_tpu.kernels.partition import maybe_partition

    core_p = maybe_partition(
        core,
        in_specs=[
            ("n", "d"), ("n", "d"), ("gone", "d"), ("n", "mone"),
            ("n", "sone"),
        ],
        out_specs=[("n", "d")],
        shardable={"n"},
    )
    dx = core_p(x2d, dy, gamma[None, :], mu, rstd)
    # dgamma/dbeta: two column reductions over the (row-sharded) batch —
    # plain XLA ops the partitioner turns into local reduce + psum.
    dy32 = dy.astype(jnp.float32)
    xhat = (x2d.astype(jnp.float32) - mu) * rstd
    return dx, jnp.sum(dy32 * xhat, 0), jnp.sum(dy32, 0)


def _bwd_call_partials(x2d, dy, gamma, mu, rstd, eps, interpret):
    """Single-device backward: one fused pass producing dx + per-block
    dgamma/dbeta partials (summed here).  Not partition-safe — the
    partials' row count depends on the global block count."""
    n, d = x2d.shape
    r = _block_rows(n, d)
    npad = _round_up(n, r)
    if npad != n:
        pad = ((0, npad - n), (0, 0))
        x2d = jnp.pad(x2d, pad)
        dy = jnp.pad(dy, pad)
        mu = jnp.pad(mu, pad)
        rstd = jnp.pad(rstd, pad)
    grid = (npad // r,)
    row_spec = pl.BlockSpec((r, d), lambda i: (i, 0))
    stat_spec = pl.BlockSpec((r, 1), lambda i: (i, 0))
    full_spec = pl.BlockSpec((1, d), lambda i: (0, 0))
    part_spec = pl.BlockSpec((8, d), lambda i: (i, 0))
    dx, dg_part, db_part = pl.pallas_call(
        _bwd_kernel_partials,
        grid=grid,
        in_specs=[row_spec, row_spec, full_spec, stat_spec, stat_spec],
        out_specs=[row_spec, part_spec, part_spec],
        out_shape=[
            jax.ShapeDtypeStruct((npad, d), dy.dtype),
            jax.ShapeDtypeStruct((grid[0] * 8, d), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * 8, d), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, dy, gamma[None, :], mu, rstd)
    # each block wrote its partial into 8 identical sublane rows: summing
    # every 8th row (rows 0 mod 8) over blocks recovers the exact total
    return (
        dx[:n],
        jnp.sum(dg_part[::8], 0),
        jnp.sum(db_part[::8], 0),
    )


# ---------------------------------------------------------------------------
# custom-VJP entry


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _layer_norm_2d(x2d, gamma, beta, eps, interpret):
    y, _, _ = _fwd_call(x2d, gamma, beta, eps, interpret)
    return y


def _layer_norm_2d_fwd(x2d, gamma, beta, eps, interpret):
    y, mu, rstd = _fwd_call(x2d, gamma, beta, eps, interpret)
    return y, (x2d, gamma, mu, rstd)


def _layer_norm_2d_bwd(eps, interpret, res, dy):
    x2d, gamma, mu, rstd = res
    dx, dg, db = _bwd_call(x2d, dy, gamma, mu, rstd, eps, interpret)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_layer_norm_2d.defvjp(_layer_norm_2d_fwd, _layer_norm_2d_bwd)


def fused_layer_norm(x, scale, bias, eps: float = 1e-6,
                     interpret: bool = False):
    """LayerNorm over the last axis of `x` with f32 statistics.

    Drop-in math replacement for flax nn.LayerNorm's default configuration
    (use_fast_variance, scale+bias).  Output dtype == x.dtype; scale/bias
    grads in the parameter dtype.
    """
    d = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape(-1, d)
    y = _layer_norm_2d(x2d, scale, bias, float(eps), interpret)
    return y.reshape(*lead, d)


def layer_norm_reference(x, scale, bias, eps: float = 1e-6):
    """Plain-XLA formula (identical math) for parity tests and the
    non-Pallas route."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)
