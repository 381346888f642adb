#!/usr/bin/env python3
"""Microbenchmark: Pallas flash attention vs XLA dense attention on the
real TPU, across (B, T) shapes.

Per-op time is measured with a CHAIN of attention calls inside one jit
(lax.fori_loop feeding each output into the next query) so device time
dominates dispatch/tunnel overhead — individually these ops are tens of
microseconds, far below the per-call round-trip latency of a remote-compile
TPU tunnel, and naive per-call timing measures only the dispatch path.

Used to decide the OPENASR_FLASH_MAX_LEN default (length-gated kernel
routing, openasr_tpu/kernels/__init__.py).
Run on hardware:  python tools/bench_flash.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/openasr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openasr_tpu.kernels.flash_attention import flash_attention
from openasr_tpu.models.layers import dot_product_attention
from openasr_tpu.ops.masks import combine_bias, padding_bias

H, DH = 8, 64
DTYPE = jnp.bfloat16
CHAIN = 32  # attention calls per jit


DROPOUT = float(os.environ.get("BENCH_FLASH_DROPOUT", "0"))


def _xla_attn(q, lens):
    bias = combine_bias(
        padding_bias(lens, q.shape[1]),
        jnp.where(
            jnp.arange(q.shape[1])[None, :]
            <= jnp.arange(q.shape[1])[:, None],
            0.0, -1e30,
        )[None, None],
    )
    if DROPOUT > 0:
        return dot_product_attention(
            q, q, q, bias, DROPOUT, False, jax.random.PRNGKey(0)
        )
    return dot_product_attention(q, q, q, bias)


def _flash_attn(q, lens):
    if DROPOUT > 0:
        return flash_attention(
            q, q, q, kv_lengths=lens, causal=True, dropout_rate=DROPOUT,
            dropout_seed=jnp.asarray([12345], jnp.uint32),
        )
    return flash_attention(q, q, q, kv_lengths=lens, causal=True)


def chained(attn):
    @jax.jit
    def run(q, lens):
        def body(_, acc):
            out = attn(acc, lens)
            # keep magnitudes bounded so the chain doesn't overflow
            return (acc + out.astype(acc.dtype)) * jnp.asarray(0.5, acc.dtype)
        return jax.lax.fori_loop(0, CHAIN, body, q)
    return run


def chained_grad(attn):
    @jax.jit
    def run(q, lens):
        def f(x):
            def body(_, acc):
                out = attn(acc, lens)
                return (acc + out.astype(acc.dtype)) * jnp.asarray(
                    0.5, acc.dtype
                )
            return jnp.sum(
                jax.lax.fori_loop(0, CHAIN, body, x).astype(jnp.float32)
            )
        return jax.grad(f)(q)
    return run


def _device_us(fn, args, n):
    """Sum of the chained program's device-lane spans from a profiler
    trace, per attention call.  Host wall-clock through the relayed
    backend measures dispatch, not execution (round-2 finding); the
    xplane device lane is the hardware's own clock.  Returns None when
    tracing is unavailable (then the wall-clock fallback is used)."""
    from openasr_tpu.utils.xprof import collect_device_events, sum_span_us

    def run():
        out = None
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)

    events = collect_device_events(run, prefix="bench_flash_trace_")
    if events is None:
        return None
    total = sum_span_us(events, "jit_run")
    if total <= 0:
        return None
    return total / (n * CHAIN)


def bench(fn, args, n=4):
    jax.block_until_ready(fn(*args))  # compile
    dev = _device_us(fn, args, n)
    if dev is not None:
        return float(dev)
    samples = []
    for _ in range(3):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.time() - t0) / (n * CHAIN) * 1e6)
    return float(np.median(samples))


def main():
    rng = np.random.RandomState(0)
    print(f"{'B':>4} {'T':>6} | {'flash fwd':>10} {'xla fwd':>10} "
          f"{'ratio':>6} | {'flash f+b':>10} {'xla f+b':>10} {'ratio':>6}",
          flush=True)
    shapes = [(8, 128), (8, 256), (64, 128), (64, 256), (64, 512),
              (16, 2048)]
    for b, t in shapes:
        q = jnp.asarray(rng.randn(b, t, H, DH) * 0.1, DTYPE)
        lens = jnp.asarray(rng.randint(t // 2, t + 1, b), jnp.int32)
        ff = bench(chained(_flash_attn), (q, lens))
        xf = bench(chained(_xla_attn), (q, lens))
        fb = bench(chained_grad(_flash_attn), (q, lens))
        xb = bench(chained_grad(_xla_attn), (q, lens))
        print(f"{b:>4} {t:>6} | {ff:>9.1f}u {xf:>9.1f}u {xf/ff:>6.2f} | "
              f"{fb:>9.1f}u {xb:>9.1f}u {xb/fb:>6.2f}", flush=True)


if __name__ == "__main__":
    main()
