"""Fused LayerNorm kernel parity (CPU interpret mode) and module routing.

The Pallas kernel (kernels/layer_norm.py) must match both the plain-XLA
formula and flax nn.LayerNorm — forward values AND all three gradients —
because models/layers.py:LayerNorm silently swaps it in on TPU.  The TPU
path itself is exercised by bench.py and the driver's compile checks.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openasr_tpu.kernels import set_fused_layer_norm
from openasr_tpu.kernels.layer_norm import (
    fused_layer_norm,
    layer_norm_reference,
)
from openasr_tpu.models.layers import LayerNorm


def _loss(fn):
    def run(x, g, b, w):
        return jnp.sum(fn(x, g, b).astype(jnp.float32) * w)
    return run


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((4, 32, 512), jnp.bfloat16),   # flagship-like, divides evenly
        ((3, 37, 80), jnp.float32),     # ragged rows + non-128 feature dim
        ((1300, 256), jnp.float32),     # 2-D input, padded final block
    ],
)
def test_forward_and_grads_match_reference(shape, dtype):
    rng = np.random.RandomState(0)
    d = shape[-1]
    x = jnp.asarray(rng.randn(*shape) * 2.0 + 0.5, dtype)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(d), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(d), jnp.float32)
    w = jnp.asarray(rng.randn(*shape), jnp.float32)

    fused = lambda x, g, b: fused_layer_norm(x, g, b, interpret=True)  # noqa: E731
    y = fused(x, g, b)
    y_ref = layer_norm_reference(x, g, b)
    assert y.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=0, atol=(1e-2 if dtype == jnp.bfloat16 else 1e-5),
    )

    gx, gg, gb = jax.grad(_loss(fused), argnums=(0, 1, 2))(x, g, b, w)
    rx, rg, rb = jax.grad(_loss(layer_norm_reference), argnums=(0, 1, 2))(
        x, g, b, w
    )
    assert gx.dtype == x.dtype
    assert gg.dtype == jnp.float32 and gb.dtype == jnp.float32
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(
        rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(rx, np.float32), **tol
    )
    np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), **tol)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), **tol)


def test_reference_formula_matches_flax():
    """layer_norm_reference (the non-Pallas route and the parity anchor)
    is bit-compatible with flax nn.LayerNorm's default configuration."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(6, 33, 128), jnp.float32)
    mod = nn.LayerNorm(dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    g = params["params"]["scale"]
    b = params["params"]["bias"]
    y_flax = mod.apply(params, x)
    y_ours = layer_norm_reference(x, g, b)
    np.testing.assert_allclose(
        np.asarray(y_ours), np.asarray(y_flax), rtol=1e-6, atol=1e-6
    )


def test_module_param_tree_matches_flax_layernorm():
    """The drop-in module exposes exactly nn.LayerNorm's param names and
    shapes, so existing checkpoints and the reference converter keep
    working."""
    x = jnp.zeros((2, 8, 64), jnp.float32)
    ours = LayerNorm(dtype=jnp.float32).init(jax.random.PRNGKey(0), x)
    flaxs = nn.LayerNorm(dtype=jnp.float32).init(jax.random.PRNGKey(0), x)
    ours_tree = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), ours)
    flax_tree = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), flaxs)
    assert ours_tree == flax_tree


def test_module_routing_gates():
    """The runtime gate (set_fused_layer_norm) and the row-count gate both
    route small/CPU inputs to the plain formula, and the two routes agree.
    (The Pallas route itself is covered in interpret mode above; compiled
    CPU pallas_call is unsupported, so the module must never pick it
    here.)"""
    x = jnp.asarray(np.random.RandomState(2).randn(2, 4, 64), jnp.float32)
    mod = LayerNorm(dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    set_fused_layer_norm(False)
    try:
        y_off = mod.apply(params, x)
    finally:
        set_fused_layer_norm(None)
    # rows=8 < min_rows: even with the gate on auto/CPU the plain path runs
    y_auto = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_auto))
    ref = layer_norm_reference(
        x, params["params"]["scale"], params["params"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(ref))
