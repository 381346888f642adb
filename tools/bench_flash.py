#!/usr/bin/env python3
"""Microbenchmark: Pallas flash attention vs XLA dense attention on the
real TPU, across (B, T) shapes, fwd and fwd+bwd.

Used to set a measured default for OPENASR_FLASH_MAX_LEN (length-gated
kernel routing, openasr_tpu/kernels/__init__.py) rather than a guess.
Run on hardware:  python tools/bench_flash.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openasr_tpu.kernels.flash_attention import flash_attention
from openasr_tpu.models.layers import dot_product_attention
from openasr_tpu.ops.masks import combine_bias, padding_bias

H, DH = 8, 64
DTYPE = jnp.bfloat16


def bench(fn, args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.time() - t0) / n * 1e6)
    return float(np.median(samples))


def main():
    rng = np.random.RandomState(0)
    print(f"{'B':>4} {'T':>6} | {'flash fwd':>10} {'xla fwd':>10} "
          f"{'ratio':>6} | {'flash f+b':>10} {'xla f+b':>10} {'ratio':>6}")
    for b, t in [(8, 128), (8, 256), (8, 512), (8, 1024),
                 (64, 128), (64, 256), (64, 512), (64, 1024),
                 (16, 2048), (4, 4096)]:
        q = jnp.asarray(rng.randn(b, t, H, DH), DTYPE)
        lens = jnp.asarray(rng.randint(t // 2, t + 1, b), jnp.int32)

        @jax.jit
        def flash_fwd(q, lens):
            return flash_attention(q, q, q, kv_lengths=lens, causal=True)

        @jax.jit
        def xla_fwd(q, lens):
            bias = combine_bias(
                padding_bias(lens, q.shape[1]),
                jnp.where(
                    jnp.arange(q.shape[1])[None, :]
                    <= jnp.arange(q.shape[1])[:, None],
                    0.0, -1e30,
                )[None, None],
            )
            return dot_product_attention(q, q, q, bias)

        @jax.jit
        def flash_bwd(q, lens):
            return jax.grad(
                lambda x: jnp.sum(
                    flash_attention(
                        x, x, x, kv_lengths=lens, causal=True
                    ).astype(jnp.float32)
                )
            )(q)

        @jax.jit
        def xla_bwd(q, lens):
            def f(x):
                bias = combine_bias(
                    padding_bias(lens, x.shape[1]),
                    jnp.where(
                        jnp.arange(x.shape[1])[None, :]
                        <= jnp.arange(x.shape[1])[:, None],
                        0.0, -1e30,
                    )[None, None],
                )
                return jnp.sum(
                    dot_product_attention(x, x, x, bias).astype(jnp.float32)
                )
            return jax.grad(f)(q)

        ff = bench(flash_fwd, (q, lens))
        xf = bench(xla_fwd, (q, lens))
        fb = bench(flash_bwd, (q, lens))
        xb = bench(xla_bwd, (q, lens))
        print(f"{b:>4} {t:>6} | {ff:>9.0f}u {xf:>9.0f}u {xf/ff:>6.2f} | "
              f"{fb:>9.0f}u {xb:>9.0f}u {xb/fb:>6.2f}")


if __name__ == "__main__":
    main()
