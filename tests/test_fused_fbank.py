"""Fused Pallas fbank kernel vs the XLA reference path, on real test audio.

Interpret mode + Precision.HIGHEST makes the comparison exact fp32 math, so
tolerances are tight.
"""

import numpy as np
import jax.numpy as jnp

from openasr_tpu.data.audio import read_wav
from openasr_tpu.ops import fbank as F
from openasr_tpu.kernels.fbank_fused import (
    fused_fbank_from_frames,
    fused_fbank_supported,
)


def _frames_reference(frames, cfg):
    """The XLA math from ops.fbank applied to pre-framed signal (no dither)."""
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis != 0.0:
        first = frames[..., :1] - cfg.preemphasis * frames[..., :1]
        rest = frames[..., 1:] - cfg.preemphasis * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
    frames = frames * jnp.asarray(F.feature_window(cfg))
    nfft = cfg.padded_window_size
    if nfft != cfg.window_size:
        frames = jnp.pad(
            frames, ((0, 0), (0, 0), (0, nfft - cfg.window_size))
        )
    spectrum = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    power = jnp.real(spectrum) ** 2 + jnp.imag(spectrum) ** 2
    mel = jnp.asarray(F.mel_banks(cfg))
    out = jnp.einsum("btf,mf->btm", power, mel)
    return jnp.log(jnp.maximum(out, F.EPSILON))


def test_fused_fbank_matches_xla_on_real_audio():
    sr, wave = read_wav("tests/data/BAC009S0764W0121.wav")
    assert sr == 16000
    wave = np.asarray(wave, np.float32)[: 16000]  # 1 second
    cfg = F.FbankConfig()
    assert fused_fbank_supported(cfg)

    frames = F.frame_signal(jnp.asarray(wave)[None, :], cfg)
    ref = np.asarray(_frames_reference(frames, cfg))
    fused = np.asarray(
        fused_fbank_from_frames(frames, cfg, block_t=32, interpret=True)
    )
    assert fused.shape == ref.shape
    # log-mel values: absolute agreement to ~1e-3 (fp32 matmul vs fft order)
    np.testing.assert_allclose(fused, ref, atol=5e-3, rtol=1e-4)


def test_fused_fbank_odd_frame_count_padding():
    rng = np.random.RandomState(0)
    cfg = F.FbankConfig()
    frames = jnp.asarray(
        rng.randn(2, 37, cfg.window_size).astype(np.float32) * 1000.0
    )
    ref = np.asarray(_frames_reference(frames, cfg))
    fused = np.asarray(
        fused_fbank_from_frames(frames, cfg, block_t=16, interpret=True)
    )
    assert fused.shape == (2, 37, cfg.num_mel_bins)
    np.testing.assert_allclose(fused, ref, atol=5e-3, rtol=1e-4)
