"""Pallas kernels under SPMD: each must partition batch/head/row-parallel.

Without the rules in kernels/partition.py, GSPMD/Shardy treats a Mosaic
custom call as opaque: sharded operands are all-gathered, the kernel runs
on the FULL arrays on every chip, and the result is replicated — measured
as 32 all-gathers around one flash-attention call on an 8-device mesh.
The mesh-parallel training tests never catch this because the kernels are
TPU-gated and the XLA fallbacks partition fine; these tests force the
kernels (interpret mode) under a virtual mesh and assert
(a) the compiled program contains NO all-gather,
(b) output shardings preserve the input batch sharding, and
(c) per-shard execution is numerically identical to the unsharded call.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import openasr_tpu.kernels as kernels


@pytest.fixture(autouse=True)
def _spmd_partitioning_on():
    """These tests build raw Meshes (not make_mesh, which flips the flag
    for >1-device meshes automatically)."""
    prev = kernels.spmd_partitioning_enabled()
    kernels.set_spmd_partitioning(True)
    yield
    kernels.set_spmd_partitioning(prev)


def _mesh(data, model=1):
    cpus = jax.devices("cpu")[: data * model]
    if len(cpus) < data * model:
        pytest.skip("not enough virtual devices")
    return Mesh(np.array(cpus).reshape(data, model), ("data", "model"))


def _no_all_gather(compiled):
    txt = compiled.as_text()
    assert "all-gather" not in txt, "kernel forced an all-gather under SPMD"


def test_flash_attention_partitions_dp():
    from openasr_tpu.kernels.flash_attention import flash_attention

    mesh = _mesh(8)
    b, t, h, d = 16, 256, 4, 64
    rng = np.random.RandomState(0)
    q, k, v = (
        jnp.asarray(rng.randn(b, t, h, d), jnp.float32) for _ in range(3)
    )
    lens = jnp.asarray(np.linspace(t // 2, t, b).astype(np.int32))
    sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(x, sh) for x in (q, k, v, lens)]

    f = jax.jit(
        lambda q, k, v, l: flash_attention(
            q, k, v, kv_lengths=l, interpret=True
        )
    )
    _no_all_gather(f.lower(*args).compile())
    out = f(*args)
    assert out.sharding.spec[0] == "data"
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(f(q, k, v, lens)), atol=1e-5
    )

    g = jax.jit(jax.grad(
        lambda q, k, v, l: flash_attention(
            q, k, v, kv_lengths=l, interpret=True
        ).sum(),
        argnums=(0, 1, 2),
    ))
    _no_all_gather(g.lower(*args).compile())
    for got, want in zip(g(*args), g(q, k, v, lens)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )


def test_flash_attention_partitions_dp_tp_heads():
    """Tensor parallelism shards heads: the kernel runs on its local head
    group (heads are independent in attention)."""
    from openasr_tpu.kernels.flash_attention import flash_attention

    mesh = _mesh(4, 2)
    b, t, h, d = 8, 256, 4, 64
    rng = np.random.RandomState(1)
    q, k, v = (
        jnp.asarray(rng.randn(b, t, h, d), jnp.float32) for _ in range(3)
    )
    lens = jnp.asarray(np.full(b, t, np.int32))
    qsh = NamedSharding(mesh, P("data", None, "model", None))
    args = [
        jax.device_put(q, qsh), jax.device_put(k, qsh),
        jax.device_put(v, qsh),
        jax.device_put(lens, NamedSharding(mesh, P("data"))),
    ]
    f = jax.jit(
        lambda q, k, v, l: flash_attention(
            q, k, v, kv_lengths=l, causal=True, interpret=True
        )
    )
    _no_all_gather(f.lower(*args).compile())
    np.testing.assert_allclose(
        np.asarray(f(*args)), np.asarray(f(q, k, v, lens)), atol=1e-5
    )


def test_fused_fbank_partitions_dp():
    from openasr_tpu.kernels.fbank_fused import (
        fused_fbank_from_frames, fused_fbank_supported,
    )
    from openasr_tpu.ops.fbank import FbankConfig

    cfg = FbankConfig(num_mel_bins=40)
    assert fused_fbank_supported(cfg)
    mesh = _mesh(8)
    b, t = 16, 64
    ws = int(cfg.sample_rate * cfg.frame_length_ms / 1000.0)
    rng = np.random.RandomState(2)
    frames = jnp.asarray(rng.randn(b, t, ws), jnp.float32)
    fs = jax.device_put(frames, NamedSharding(mesh, P("data")))

    f = jax.jit(lambda x: fused_fbank_from_frames(x, cfg, interpret=True))
    _no_all_gather(f.lower(fs).compile())
    out = f(fs)
    assert out.sharding.spec[0] == "data"
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(f(frames)), rtol=1e-5, atol=1e-5
    )


def test_fused_layer_norm_partitions_rows():
    from openasr_tpu.kernels.layer_norm import (
        fused_layer_norm, layer_norm_reference,
    )

    mesh = _mesh(8)
    b, t, d = 16, 24, 128
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    gamma = jnp.asarray(rng.randn(d), jnp.float32)
    beta = jnp.asarray(rng.randn(d), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    f = jax.jit(
        lambda x, g, bta: fused_layer_norm(x, g, bta, interpret=True)
    )
    _no_all_gather(f.lower(xs, gamma, beta).compile())
    out = f(xs, gamma, beta)
    assert out.sharding.spec[0] == "data"
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(f(x, gamma, beta)), atol=1e-5
    )

    def loss(x, g, bta):
        return (
            fused_layer_norm(x, g, bta, interpret=True)
            .astype(jnp.float32).sum()
        )

    grads_sharded = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        xs, gamma, beta
    )
    grads_ref = jax.jit(jax.grad(
        lambda x, g, bta: layer_norm_reference(x, g, bta)
        .astype(jnp.float32).sum(),
        argnums=(0, 1, 2),
    ))(x, gamma, beta)
    for got, want in zip(grads_sharded, grads_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )


def test_sharded_dropout_masks_decorrelate_across_shards():
    """Kernels hash dropout masks from shard-LOCAL indices; the partition
    lowering folds the shard's mesh position into the seed so chips do not
    regenerate identical masks for their local rows.  With every batch row
    carrying IDENTICAL content, all outputs must still be pairwise
    distinct — without the seed perturbation, rows sharing a local index
    on different chips would be bit-identical."""
    from openasr_tpu.kernels.flash_attention import flash_attention

    mesh = _mesh(8)
    b, t, h, d = 16, 128, 2, 64
    rng = np.random.RandomState(5)
    row_q = rng.randn(1, t, h, d).astype(np.float32)
    row_k = rng.randn(1, t, h, d).astype(np.float32)
    row_v = rng.randn(1, t, h, d).astype(np.float32)
    q = jnp.asarray(np.repeat(row_q, b, 0))
    k = jnp.asarray(np.repeat(row_k, b, 0))
    v = jnp.asarray(np.repeat(row_v, b, 0))
    lens = jnp.asarray(np.full(b, t, np.int32))
    sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(x, sh) for x in (q, k, v, lens)]

    f = jax.jit(
        lambda q, k, v, l: flash_attention(
            q, k, v, kv_lengths=l, dropout_rate=0.5,
            dropout_seed=jnp.asarray([7], jnp.uint32), interpret=True,
        )
    )
    out = np.asarray(f(*args))
    flat = out.reshape(b, -1)
    for i in range(b):
        for j in range(i + 1, b):
            assert not np.array_equal(flat[i], flat[j]), (
                f"rows {i} and {j} got identical dropout masks"
            )
