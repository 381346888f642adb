"""Fused Pallas TPU kernel for the Kaldi fbank frontend.

The reference computes fbank per utterance on the host with a Python loop
(reference: src/blocks/sp_layers.py:76-101 calling
src/third_party/kaldi_signal.py:458 per sample).  The TPU-first observation
is that everything after framing is LINEAR until the power/log
nonlinearities:

    DC-removal        y = (I - 11^T/ws) x
    preemphasis       y_i = x_i - p*x_{i-1}   (y_0 = (1-p) x_0)
    povey window      y = diag(w) x
    zero-pad + DFT    re_k = sum_n y_n cos(2*pi*k*n/nfft)   (n < ws)

so the whole chain folds into two precomputed matrices Mc, Ms of shape
[ws, F] and fbank becomes

    power = (f @ Mc)^2 + (f @ Ms)^2          # MXU
    feats = log(max(power @ MelT, eps))      # MXU + VPU

One Pallas kernel runs that per (batch, frame-block): three matmuls and the
elementwise square/log never leave VMEM, so the [B, T, F] spectrum and power
intermediates are never materialized in HBM (XLA cannot fuse across two
matmuls).  F is padded to a lane multiple and the mel output to 128 lanes;
zero columns/rows make the padding exact.

Dither (additive noise on raw frames) commutes with the linear fold and is
applied by the caller before the kernel.  `use_energy` configs fall back to
the XLA path in openasr_tpu.ops.fbank.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

EPSILON = float(np.finfo(np.float32).eps)


from openasr_tpu.kernels._util import round_up as _round_up


@functools.lru_cache(maxsize=4)
def _fused_matrices(cfg):
    """(Mc [ws, Fp], Ms [ws, Fp], MelT [Fp, Mp]) in float32, fp64 math.

    cfg is an openasr_tpu.ops.fbank.FbankConfig (hashable NamedTuple).
    """
    from openasr_tpu.ops.fbank import feature_window, mel_banks

    ws = cfg.window_size
    nfft = cfg.padded_window_size
    f = nfft // 2 + 1

    a = np.eye(ws, dtype=np.float64)
    if cfg.remove_dc_offset:
        a = (np.eye(ws) - np.full((ws, ws), 1.0 / ws)) @ a
    if cfg.preemphasis != 0.0:
        p = np.eye(ws)
        idx = np.arange(1, ws)
        p[idx, idx - 1] = -cfg.preemphasis
        p[0, 0] = 1.0 - cfg.preemphasis
        a = p @ a
    a = np.diag(feature_window(cfg).astype(np.float64)) @ a  # [ws, ws]

    n = np.arange(ws, dtype=np.float64)[None, :]
    k = np.arange(f, dtype=np.float64)[:, None]
    ang = 2.0 * math.pi * k * n / nfft
    cos_m = np.cos(ang) @ a  # [F, ws]
    sin_m = np.sin(ang) @ a

    mel = mel_banks(cfg).astype(np.float64)  # [M, F]

    fp = _round_up(f, 128)
    mp = _round_up(cfg.num_mel_bins, 128)
    mc = np.zeros((ws, fp), np.float32)
    ms = np.zeros((ws, fp), np.float32)
    mel_t = np.zeros((fp, mp), np.float32)
    mc[:, :f] = cos_m.T
    ms[:, :f] = sin_m.T
    mel_t[:f, : cfg.num_mel_bins] = mel.T
    return mc, ms, mel_t


def _fbank_kernel(f_ref, mc_ref, ms_ref, mel_ref, o_ref, *, use_log: bool):
    """f_ref [1, block_t, ws] -> o_ref [1, block_t, Mp]."""
    frames = f_ref[0].astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, mc_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, ms_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:], precision=hi,
                  preferred_element_type=jnp.float32)
    if use_log:
        mel = jnp.log(jnp.maximum(mel, EPSILON))
    o_ref[0] = mel


def fused_fbank_from_frames(
    frames: jnp.ndarray,
    cfg,
    block_t: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """frames [B, T, window_size] (dither already applied) -> [B, T, M]."""
    if interpret is None:
        from openasr_tpu.kernels import default_platform

        interpret = default_platform() != "tpu"
    b, t, ws = frames.shape
    mc, ms, mel_t = _fused_matrices(cfg)
    mp = mel_t.shape[1]

    block_t = min(block_t, _round_up(t, 8))
    t_p = _round_up(t, block_t)
    if t_p != t:
        frames = jnp.pad(frames, ((0, 0), (0, t_p - t), (0, 0)))

    kernel = functools.partial(
        _fbank_kernel, use_log=bool(cfg.use_log_fbank)
    )

    # Shapes/grid derived inside core: under SPMD (kernels/partition.py)
    # the batch dim runs sharded and each chip fbanks only its own rows.
    def core(frames, mc, ms, mel_t):
        bl, t_l = frames.shape[0], frames.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(bl, t_l // block_t),
            in_specs=[
                pl.BlockSpec((1, block_t, ws), lambda i, j: (i, j, 0)),
                pl.BlockSpec((ws, mc.shape[1]), lambda i, j: (0, 0)),
                pl.BlockSpec((ws, ms.shape[1]), lambda i, j: (0, 0)),
                pl.BlockSpec((mel_t.shape[0], mp), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_t, mp), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((bl, t_l, mp), jnp.float32),
            interpret=interpret,
        )(frames, mc, ms, mel_t)

    from openasr_tpu.kernels.partition import maybe_partition

    core_p = maybe_partition(
        core,
        in_specs=[
            ("b", "t", "ws"),
            ("ws", "mcc"),
            ("ws", "msc"),
            ("melr", "melc"),
        ],
        out_specs=[("b", "t", "melc")],
        shardable={"b"},
    )
    out = core_p(
        frames, jnp.asarray(mc), jnp.asarray(ms), jnp.asarray(mel_t)
    )
    return out[:, :t, : cfg.num_mel_bins]


def fused_fbank_supported(cfg) -> bool:
    """The fused path covers the standard log-power-fbank configs; energy
    and magnitude-spectrum variants use the XLA path."""
    return bool(cfg.use_power) and not bool(cfg.use_energy)
