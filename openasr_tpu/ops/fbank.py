"""Kaldi-compatible log-mel filterbank, batched and jit-friendly.

Capability parity with the reference's per-utterance torchaudio-compliance
pipeline (reference: src/third_party/kaldi_signal.py:458-575 `fbank`, called
per-sample in a Python loop at src/blocks/sp_layers.py:80-91).  This
implementation computes the whole padded batch [B, N] in one fused XLA
program: frame extraction is a strided gather, windowing/preemphasis are
vectorized, and the FFT+mel projection run as batched matmuls on the MXU.

Semantics follow Kaldi's compute-fbank-feats with snip_edges=True:
  frame_length 25 ms, frame_shift 10 ms, povey window, DC removal,
  preemphasis 0.97, FFT size rounded up to a power of two, power spectrum,
  triangular mel banks between low_freq=20 and the Nyquist, natural log with
  an fp32-epsilon floor.

Determinism note: Kaldi applies dither unconditionally (the reference
inherits this, making even evaluation stochastic).  Here dither is applied
only when a PRNG key is provided, so inference is deterministic by default.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openasr_tpu.ops.masks import sequence_mask

EPSILON = float(np.finfo(np.float32).eps)

MEL_HIGH_FREQ_Q = 1127.0
MEL_LOW_FREQ = 700.0


def mel_scale(freq):
    return MEL_HIGH_FREQ_Q * np.log(1.0 + freq / MEL_LOW_FREQ)


def next_power_of_two(x: int) -> int:
    return 1 if x == 0 else 2 ** (int(x) - 1).bit_length()


class FbankConfig(NamedTuple):
    sample_rate: float = 16000.0
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 80
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 means offset from Nyquist
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"
    blackman_coeff: float = 0.42
    dither: float = 1.0
    use_energy: bool = False
    raw_energy: bool = True
    energy_floor: float = 0.0
    use_log_fbank: bool = True
    use_power: bool = True
    round_to_power_of_two: bool = True

    @property
    def window_size(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def window_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def padded_window_size(self) -> int:
        ws = self.window_size
        return next_power_of_two(ws) if self.round_to_power_of_two else ws

    @property
    def feat_dim(self) -> int:
        return self.num_mel_bins + int(self.use_energy)


def feature_window(cfg: FbankConfig) -> np.ndarray:
    """Kaldi window function (povey = hann^0.85)."""
    m = cfg.window_size
    n = np.arange(m, dtype=np.float64)
    a = 2.0 * math.pi / (m - 1)
    if cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * n)) ** 0.85
    elif cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * n)
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * n)
    elif cfg.window_type == "rectangular":
        w = np.ones(m)
    elif cfg.window_type == "blackman":
        b = cfg.blackman_coeff
        w = b - 0.5 * np.cos(a * n) + (0.5 - b) * np.cos(2 * a * n)
    else:
        raise ValueError(f"Unknown window type: {cfg.window_type}")
    return w.astype(np.float32)


def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """Triangular mel filterbank matrix [num_bins, padded_window_size//2+1].

    Matches Kaldi's MelBanks: bins are defined on the first
    padded_window_size//2 FFT bins; the Nyquist column is zero.
    """
    nfft = cfg.padded_window_size
    num_fft_bins = nfft // 2
    nyquist = 0.5 * cfg.sample_rate
    high_freq = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq

    fft_bin_width = cfg.sample_rate / nfft
    mel_low = mel_scale(cfg.low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)

    bin_idx = np.arange(cfg.num_mel_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)[None, :]
    mel = mel_scale(freqs)
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    weights = np.maximum(0.0, np.minimum(up_slope, down_slope))

    full = np.zeros((cfg.num_mel_bins, num_fft_bins + 1), dtype=np.float32)
    full[:, :num_fft_bins] = weights
    return full


def num_frames_of(lengths, cfg: FbankConfig):
    """snip_edges frame count: 0 if len < window else 1 + (len-window)//shift."""
    lengths = jnp.asarray(lengths, jnp.int32)
    n = 1 + (lengths - cfg.window_size) // cfg.window_shift
    return jnp.where(lengths < cfg.window_size, 0, n)


def frame_signal(waves: jnp.ndarray, cfg: FbankConfig) -> jnp.ndarray:
    """[B, N] -> [B, T, window_size] strided frames (snip_edges)."""
    b, n = waves.shape
    t = 1 + (n - cfg.window_size) // cfg.window_shift
    starts = np.arange(t) * cfg.window_shift
    idx = starts[:, None] + np.arange(cfg.window_size)[None, :]
    return waves[:, idx]


@partial(jax.jit, static_argnames=("cfg",))
def fbank(
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FbankConfig = FbankConfig(),
    dither_key: Optional[jax.Array] = None,
) -> tuple:
    """Batched log-mel fbank.

    Args:
      waves: [B, N] float32, zero-padded waveforms (int16-scaled values,
        i.e. the same range the Kaldi pipeline consumes).
      lengths: [B] int32 valid sample counts.
      cfg: static feature config.
      dither_key: optional PRNG key enabling Kaldi dither.

    Returns:
      feats: [B, T, feat_dim] float32, zero outside valid frames.
      feat_lengths: [B] int32.
    """
    waves = waves.astype(jnp.float32)
    frames = frame_signal(waves, cfg)  # [B, T, ws]

    if dither_key is not None and cfg.dither != 0.0:
        frames = frames + cfg.dither * jax.random.normal(
            dither_key, frames.shape, dtype=jnp.float32
        )

    from openasr_tpu.kernels import fused_fbank_enabled
    from openasr_tpu.kernels.fbank_fused import (
        fused_fbank_from_frames,
        fused_fbank_supported,
    )

    if fused_fbank_enabled() and fused_fbank_supported(cfg):
        # Fused Pallas path: DC-removal/preemphasis/window/DFT folded into
        # matmul matrices, power+mel+log fused in VMEM.
        mel_energies = fused_fbank_from_frames(frames, cfg)
        feat_lengths = num_frames_of(lengths, cfg)
        valid = sequence_mask(feat_lengths, mel_energies.shape[1])
        feats = jnp.where(valid[..., None], mel_energies, 0.0)
        return feats, feat_lengths

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    if cfg.use_energy and cfg.raw_energy:
        log_energy = jnp.log(
            jnp.maximum(jnp.sum(frames * frames, axis=-1), EPSILON)
        )

    if cfg.preemphasis != 0.0:
        first = frames[..., :1] - cfg.preemphasis * frames[..., :1]
        rest = frames[..., 1:] - cfg.preemphasis * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)

    frames = frames * jnp.asarray(feature_window(cfg))

    if cfg.use_energy and not cfg.raw_energy:
        log_energy = jnp.log(
            jnp.maximum(jnp.sum(frames * frames, axis=-1), EPSILON)
        )

    nfft = cfg.padded_window_size
    if nfft != cfg.window_size:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, nfft - cfg.window_size)))

    spectrum = jnp.fft.rfft(frames, axis=-1)  # [B, T, nfft//2+1]
    power = jnp.real(spectrum) ** 2 + jnp.imag(spectrum) ** 2
    if not cfg.use_power:
        power = jnp.sqrt(power)

    mel = jnp.asarray(mel_banks(cfg))  # [M, nfft//2+1]
    mel_energies = jnp.einsum(
        "btf,mf->btm", power, mel, preferred_element_type=jnp.float32
    )
    if cfg.use_log_fbank:
        mel_energies = jnp.log(jnp.maximum(mel_energies, EPSILON))

    if cfg.use_energy:
        if cfg.energy_floor > 0.0:
            log_energy = jnp.maximum(
                log_energy, math.log(cfg.energy_floor)
            )
        # htk_compat=False: energy goes first (kaldi default)
        mel_energies = jnp.concatenate(
            [log_energy[..., None], mel_energies], axis=-1
        )

    feat_lengths = num_frames_of(lengths, cfg)
    valid = sequence_mask(feat_lengths, mel_energies.shape[1])
    feats = jnp.where(valid[..., None], mel_energies, 0.0)
    return feats, feat_lengths


def fbank_config_from_model_cfg(signal_cfg) -> FbankConfig:
    """Build FbankConfig from the reference YAML `model.signal` section
    (reference: src/blocks/sp_layers.py:38-48)."""
    return FbankConfig(
        sample_rate=float(signal_cfg.get("sample_rate", 16000)),
        num_mel_bins=int(signal_cfg.get("num_mel_bins", 80)),
        use_energy=bool(signal_cfg.get("use_energy", False)),
        dither=float(signal_cfg.get("dither", 1.0)),
    )
