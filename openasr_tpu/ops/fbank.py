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
    # VTLN piecewise-linear warp (Kaldi semantics; warp 1.0 = off)
    vtln_low: float = 100.0
    vtln_high: float = -500.0  # <0 means offset from Nyquist
    vtln_warp: float = 1.0

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


def inverse_mel_scale(mel):
    return MEL_LOW_FREQ * (np.exp(np.asarray(mel) / MEL_HIGH_FREQ_Q) - 1.0)


def vtln_warp_freq(vtln_low: float, vtln_high: float, low_freq: float,
                   high_freq: float, warp: float, freq):
    """Kaldi's 3-piece linear VTLN warp F(freq) with F(low)==low and
    F(high)==high (reference: src/third_party/kaldi_signal.py:302-372):
    the middle piece is freq/warp between inflection points
    l = vtln_low*max(1, warp) and h = vtln_high*min(1, warp)."""
    assert vtln_low > low_freq and vtln_high < high_freq
    freq = np.asarray(freq, np.float64)
    l = vtln_low * max(1.0, warp)
    h = vtln_high * min(1.0, warp)
    assert l > low_freq and h < high_freq
    scale = 1.0 / warp
    scale_left = (scale * l - low_freq) / (l - low_freq)
    scale_right = (high_freq - scale * h) / (high_freq - h)

    res = np.where(
        freq < l,
        low_freq + scale_left * (freq - low_freq),
        np.where(
            freq < h,
            scale * freq,
            high_freq + scale_right * (freq - high_freq),
        ),
    )
    outside = (freq < low_freq) | (freq > high_freq)
    return np.where(outside, freq, res)


def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """Triangular mel filterbank matrix [num_bins, padded_window_size//2+1].

    Matches Kaldi's MelBanks incl. VTLN warping of the bin edges when
    cfg.vtln_warp != 1 (reference: kaldi_signal.py:389-455): bins are
    defined on the first padded_window_size//2 FFT bins; the Nyquist
    column is zero.
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

    if cfg.vtln_warp != 1.0:
        vtln_high = (
            cfg.vtln_high if cfg.vtln_high > 0 else nyquist + cfg.vtln_high
        )

        def warp_mel(m):
            return mel_scale(vtln_warp_freq(
                cfg.vtln_low, vtln_high, cfg.low_freq, high_freq,
                cfg.vtln_warp, inverse_mel_scale(m),
            ))

        left_mel = warp_mel(left_mel)
        center_mel = warp_mel(center_mel)
        right_mel = warp_mel(right_mel)

    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)[None, :]
    mel = mel_scale(freqs)
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    if cfg.vtln_warp == 1.0:
        weights = np.maximum(0.0, np.minimum(up_slope, down_slope))
    else:
        # warping may reorder the edges: assign each region explicitly
        weights = np.zeros_like(up_slope)
        up_idx = (mel > left_mel) & (mel <= center_mel)
        down_idx = (mel > center_mel) & (mel < right_mel)
        weights[up_idx] = up_slope[up_idx]
        weights[down_idx] = down_slope[down_idx]

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


@partial(jax.jit, static_argnames=("cfg",))
def spectrogram(
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FbankConfig = FbankConfig(),
    dither_key: Optional[jax.Array] = None,
) -> tuple:
    """Batched Kaldi log power spectrogram (compute-spectrogram-feats).

    Capability parity with the reference's per-utterance `spectrogram`
    (reference: src/third_party/kaldi_signal.py:223-282): framing, DC
    removal, preemphasis, window, rFFT power in log domain, and the zeroth
    bin replaced with the frame log-energy.

    Returns ([B, T, nfft//2 + 1] float32, [B] int32 frame counts).
    """
    waves = waves.astype(jnp.float32)
    frames = frame_signal(waves, cfg)  # [B, T, ws]
    if dither_key is not None and cfg.dither != 0.0:
        frames = frames + cfg.dither * jax.random.normal(
            dither_key, frames.shape, dtype=jnp.float32
        )
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    def frame_log_energy(f):
        e = jnp.log(jnp.maximum(jnp.sum(f * f, axis=-1), EPSILON))
        if cfg.energy_floor > 0.0:
            e = jnp.maximum(e, math.log(cfg.energy_floor))
        return e

    if cfg.raw_energy:
        log_energy = frame_log_energy(frames)
    if cfg.preemphasis != 0.0:
        first = frames[..., :1] - cfg.preemphasis * frames[..., :1]
        rest = frames[..., 1:] - cfg.preemphasis * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
    frames = frames * jnp.asarray(feature_window(cfg))
    if not cfg.raw_energy:
        log_energy = frame_log_energy(frames)

    nfft = cfg.padded_window_size
    if nfft != cfg.window_size:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, nfft - cfg.window_size)))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.log(
        jnp.maximum(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2, EPSILON)
    )
    power = jnp.concatenate([log_energy[..., None], power[..., 1:]], axis=-1)

    feat_lengths = num_frames_of(lengths, cfg)
    valid = sequence_mask(feat_lengths, power.shape[1])
    return jnp.where(valid[..., None], power, 0.0), feat_lengths


def dct_matrix(num_ceps: int, num_mel_bins: int) -> np.ndarray:
    """Kaldi DCT-II matrix [num_mel_bins, num_ceps] for a right-multiply
    (reference: src/third_party/kaldi_signal.py:537-549): orthonormal rows,
    with the C0 column fixed to sqrt(1/num_mel_bins)."""
    n = num_mel_bins
    i = np.arange(n, dtype=np.float64)[:, None]  # mel bin
    j = np.arange(num_ceps, dtype=np.float64)[None, :]  # cepstrum
    m = np.sqrt(2.0 / n) * np.cos(np.pi / n * (i + 0.5) * j)
    m[:, 0] = math.sqrt(1.0 / n)
    return m.astype(np.float32)


def lifter_coeffs(num_ceps: int, cepstral_lifter: float) -> np.ndarray:
    """1 + 0.5*Q*sin(pi*i/Q) (reference: kaldi_signal.py:552-557)."""
    i = np.arange(num_ceps, dtype=np.float64)
    return (
        1.0 + 0.5 * cepstral_lifter * np.sin(math.pi * i / cepstral_lifter)
    ).astype(np.float32)


@partial(
    jax.jit,
    static_argnames=("cfg", "num_ceps", "cepstral_lifter", "htk_compat"),
)
def mfcc(
    waves: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FbankConfig = FbankConfig(num_mel_bins=23),
    num_ceps: int = 13,
    cepstral_lifter: float = 22.0,
    htk_compat: bool = False,
    dither_key: Optional[jax.Array] = None,
) -> tuple:
    """Batched Kaldi MFCC (compute-mfcc-feats).

    Capability parity with the reference's per-utterance `mfcc`
    (reference: src/third_party/kaldi_signal.py:576-668): log-mel fbank ->
    DCT-II -> cepstral liftering, with the energy/HTK layout options.

    Returns ([B, T, num_ceps] float32, [B] int32 frame counts).
    """
    assert num_ceps <= cfg.num_mel_bins
    feature, feat_lengths = fbank(waves, lengths, cfg, dither_key)

    if cfg.use_energy:
        # fbank packs energy first (htk_compat handling happens here)
        log_energy = feature[..., 0]
        feature = feature[..., 1:]

    feats = jnp.einsum(
        "btm,mc->btc", feature, jnp.asarray(dct_matrix(num_ceps, cfg.num_mel_bins)),
        preferred_element_type=jnp.float32,
    )
    if cepstral_lifter != 0.0:
        feats = feats * jnp.asarray(lifter_coeffs(num_ceps, cepstral_lifter))
    if cfg.use_energy:
        feats = jnp.concatenate([log_energy[..., None], feats[..., 1:]], -1)
    if htk_compat:
        energy = feats[..., :1]
        if not cfg.use_energy:
            energy = energy * math.sqrt(2.0)
        feats = jnp.concatenate([feats[..., 1:], energy], -1)

    valid = sequence_mask(feat_lengths, feats.shape[1])
    return jnp.where(valid[..., None], feats, 0.0), feat_lengths


# ------------------------------------------------------------------ resample

def _resample_plan(
    n: int, orig_freq: int, new_freq: int, lowpass_filter_width: int
):
    """Static windowed-sinc interpolation plan (Kaldi LinearResample,
    reference: src/third_party/kaldi_signal.py:679-808): per output sample
    j with phase p = j mod U the contributing input window starts at
    first_index[p] + (j // U) * I and uses weights[p].

    Returns (index matrix [T_out, W] into the left-padded signal, weight
    matrix [T_out, W], left padding, total padded length, T_out).
    """
    gcd = math.gcd(orig_freq, new_freq)
    in_unit = orig_freq // gcd
    out_unit = new_freq // gcd
    lowpass_cutoff = 0.99 * 0.5 * min(orig_freq, new_freq)
    window_width = lowpass_filter_width / (2.0 * lowpass_cutoff)

    output_t = np.arange(out_unit, dtype=np.float64) / new_freq
    min_input_index = np.ceil((output_t - window_width) * orig_freq)
    max_input_index = np.floor((output_t + window_width) * orig_freq)
    w = int((max_input_index - min_input_index).max()) + 1

    j = np.arange(w, dtype=np.float64)[None, :]
    input_index = min_input_index[:, None] + j
    delta_t = input_index / orig_freq - output_t[:, None]
    inside = np.abs(delta_t) < window_width
    weights = np.where(
        inside,
        0.5 * (1.0 + np.cos(
            2.0 * math.pi * lowpass_cutoff / lowpass_filter_width * delta_t
        )),
        0.0,
    )
    sinc = np.where(
        delta_t == 0.0,
        2.0 * lowpass_cutoff,
        np.sin(2.0 * math.pi * lowpass_cutoff * delta_t)
        / np.where(delta_t == 0.0, 1.0, math.pi * delta_t),
    )
    weights = weights * sinc / orig_freq  # [U, W]

    # number of output samples for the open interval [0, n/orig_freq)
    tick = (orig_freq * new_freq) // gcd
    interval = n * (tick // orig_freq)
    last = interval // (tick // new_freq)
    if last * (tick // new_freq) == interval:
        last -= 1
    t_out = max(int(last) + 1, 0)

    phases = np.arange(t_out) % out_unit
    blocks = np.arange(t_out) // out_unit
    starts = min_input_index[phases].astype(np.int64) + blocks * in_unit
    idx = starts[:, None] + np.arange(w)[None, :]  # [T_out, W], may be <0/>n
    left = int(max(0, -idx.min())) if t_out else 0
    idx = idx + left
    total = int(idx.max()) + 1 if t_out else n
    return (
        idx.astype(np.int32),
        weights[phases].astype(np.float32),
        left,
        max(total, n + left),
        t_out,
    )


def resample_waveform(
    waves: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    lengths: Optional[jnp.ndarray] = None,
):
    """Batched Kaldi LinearResample (windowed-sinc interpolation).

    Capability parity with the reference's per-utterance conv1d loop
    (reference: src/third_party/kaldi_signal.py:808-894), recast as one
    gather + weighted reduction: out[b, j] = dot(weights[j mod U],
    x[b, first(j mod U) + (j div U) * I : ... + W]).

    Args:
      waves: [B, N] float32 (zero-padded).
      lengths: optional [B] valid sample counts; output beyond each
        utterance's own resampled length is zeroed and the per-utterance
        output lengths are returned.

    Returns [B, T_out] (and [B] output lengths when `lengths` is given).
    """
    orig_freq, new_freq = int(orig_freq), int(new_freq)
    b, n = waves.shape
    idx, w, left, total, t_out = _resample_plan(
        n, orig_freq, new_freq, lowpass_filter_width
    )
    if t_out == 0:
        out = jnp.zeros((b, 0), jnp.float32)
        return (out, jnp.zeros((b,), jnp.int32)) if lengths is not None else out
    x = jnp.pad(waves.astype(jnp.float32), ((0, 0), (left, total - left - n)))
    gathered = x[:, jnp.asarray(idx)]  # [B, T_out, W]
    out = jnp.einsum(
        "btw,tw->bt", gathered, jnp.asarray(w),
        preferred_element_type=jnp.float32,
    )
    if lengths is None:
        return out

    # per-utterance output length: same tick arithmetic as _resample_plan,
    # decomposed as q*u + (r*u)//v to stay inside int32 (x64 is disabled)
    gcd = math.gcd(orig_freq, new_freq)
    u = new_freq // gcd   # ticks per input period
    v = orig_freq // gcd  # ticks per output period
    ln = jnp.asarray(lengths, jnp.int32)
    q, r = ln // v, ln % v
    last = q * u + (r * u) // v  # == (lengths * u) // v
    exact = (r * u) % v == 0
    last = last - exact.astype(last.dtype)
    out_lengths = jnp.maximum(last + 1, 0).astype(jnp.int32)
    valid = sequence_mask(out_lengths, t_out)
    return jnp.where(valid, out, 0.0), out_lengths


def fbank_config_from_model_cfg(signal_cfg) -> FbankConfig:
    """Build FbankConfig from the reference YAML `model.signal` section
    (reference: src/blocks/sp_layers.py:38-48)."""
    return FbankConfig(
        sample_rate=float(signal_cfg.get("sample_rate", 16000)),
        num_mel_bins=int(signal_cfg.get("num_mel_bins", 80)),
        use_energy=bool(signal_cfg.get("use_energy", False)),
        dither=float(signal_cfg.get("dither", 1.0)),
    )
