"""spectrogram / mfcc / resample_waveform tests against independent
scalar NumPy goldens (same two-implementation strategy as test_fbank.py).

Reference capabilities being covered: src/third_party/kaldi_signal.py
`spectrogram` (:223), `mfcc` (:576), `resample_waveform` (:808).
"""

import math
import os

import numpy as np
import pytest

from openasr_tpu.ops.fbank import (
    EPSILON,
    FbankConfig,
    dct_matrix,
    feature_window,
    lifter_coeffs,
    mfcc,
    resample_waveform,
    spectrogram,
)
from test_fbank import golden_fbank_single

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def wav():
    from scipy.io import wavfile

    rate, data = wavfile.read(os.path.join(DATA, "BAC009S0764W0121.wav"))
    assert rate == 16000
    return data.astype(np.float32)


# ------------------------------------------------------------- spectrogram

def golden_spectrogram_single(wave, cfg):
    ws, shift, nfft = cfg.window_size, cfg.window_shift, cfg.padded_window_size
    n = len(wave)
    t = 1 + (n - ws) // shift
    window = feature_window(cfg).astype(np.float64)
    out = np.zeros((t, nfft // 2 + 1), np.float64)
    for i in range(t):
        frame = wave[i * shift : i * shift + ws].astype(np.float64).copy()
        if cfg.remove_dc_offset:
            frame -= frame.mean()
        if cfg.raw_energy:
            log_e = np.log(max((frame * frame).sum(), EPSILON))
        if cfg.preemphasis:
            prev = np.concatenate([[frame[0]], frame[:-1]])
            frame = frame - cfg.preemphasis * prev
        frame *= window
        if not cfg.raw_energy:
            log_e = np.log(max((frame * frame).sum(), EPSILON))
        spec = np.fft.rfft(frame, n=nfft)
        power = np.log(np.maximum(np.abs(spec) ** 2, EPSILON))
        power[0] = log_e
        out[i] = power
    return out.astype(np.float32)


def test_spectrogram_matches_golden(wav):
    cfg = FbankConfig(dither=0.0)
    n = 8000
    golden = golden_spectrogram_single(wav[:n], cfg)
    waves = np.zeros((2, n), np.float32)
    waves[0] = wav[:n]
    waves[1, : n // 2] = wav[n : n + n // 2]
    feats, lens = spectrogram(waves, np.array([n, n // 2], np.int32), cfg)
    feats = np.asarray(feats)
    assert int(lens[0]) == golden.shape[0]
    np.testing.assert_allclose(
        feats[0, : golden.shape[0]], golden, rtol=2e-4, atol=2e-3
    )
    golden2 = golden_spectrogram_single(wav[n : n + n // 2], cfg)
    np.testing.assert_allclose(
        feats[1, : golden2.shape[0]], golden2, rtol=2e-4, atol=2e-3
    )
    assert np.all(feats[1, int(lens[1]) :] == 0.0)


# -------------------------------------------------------------------- mfcc

def golden_mfcc_single(wave, cfg, num_ceps, cepstral_lifter, htk_compat):
    feature = golden_fbank_single(wave, cfg).astype(np.float64)
    if cfg.use_energy:
        log_e = feature[:, 0]
        feature = feature[:, 1:]
    feats = feature @ dct_matrix(num_ceps, cfg.num_mel_bins).astype(np.float64)
    if cepstral_lifter != 0.0:
        feats = feats * lifter_coeffs(num_ceps, cepstral_lifter)
    if cfg.use_energy:
        feats[:, 0] = log_e
    if htk_compat:
        energy = feats[:, :1]
        if not cfg.use_energy:
            energy = energy * math.sqrt(2.0)
        feats = np.concatenate([feats[:, 1:], energy], axis=1)
    return feats.astype(np.float32)


@pytest.mark.parametrize("use_energy,htk_compat", [
    (False, False), (True, False), (False, True),
])
def test_mfcc_matches_golden(wav, use_energy, htk_compat):
    cfg = FbankConfig(num_mel_bins=23, dither=0.0, use_energy=use_energy)
    n = 8000
    golden = golden_mfcc_single(wav[:n], cfg, 13, 22.0, htk_compat)
    feats, lens = mfcc(
        wav[None, :n], np.array([n], np.int32), cfg, num_ceps=13,
        cepstral_lifter=22.0, htk_compat=htk_compat,
    )
    feats = np.asarray(feats)
    assert feats.shape[-1] == 13
    assert int(lens[0]) == golden.shape[0]
    np.testing.assert_allclose(
        feats[0, : golden.shape[0]], golden, rtol=2e-3, atol=2e-2
    )


# ---------------------------------------------------------------- resample

def golden_resample_single(wave, orig_freq, new_freq, width=6):
    """Direct per-output-sample windowed-sinc sum (Kaldi LinearResample)."""
    lowpass_cutoff = 0.99 * 0.5 * min(orig_freq, new_freq)
    window_width = width / (2.0 * lowpass_cutoff)
    n = len(wave)
    gcd = math.gcd(orig_freq, new_freq)
    interval = n * (new_freq // gcd)
    last = interval // (orig_freq // gcd)
    if last * (orig_freq // gcd) == interval:
        last -= 1
    t_out = last + 1
    out = np.zeros(t_out, np.float64)
    for j in range(t_out):
        t = j / new_freq
        lo = int(np.ceil((t - window_width) * orig_freq))
        hi = int(np.floor((t + window_width) * orig_freq))
        acc = 0.0
        for i in range(lo, hi + 1):
            if not 0 <= i < n:
                continue
            dt = i / orig_freq - t
            if abs(dt) >= window_width:
                continue
            win = 0.5 * (1.0 + np.cos(
                2.0 * math.pi * lowpass_cutoff / width * dt
            ))
            sinc = (
                2.0 * lowpass_cutoff if dt == 0.0
                else np.sin(2.0 * math.pi * lowpass_cutoff * dt) / (math.pi * dt)
            )
            acc += wave[i] * win * sinc / orig_freq
        out[j] = acc
    return out.astype(np.float32)


@pytest.mark.parametrize("orig,new", [(16000, 8000), (8000, 16000),
                                      (16000, 11025)])
def test_resample_matches_golden(wav, orig, new):
    n = 2000
    wave = wav[:n]
    golden = golden_resample_single(wave, orig, new)
    out = np.asarray(resample_waveform(wave[None, :], orig, new))
    assert out.shape == (1, golden.shape[0])
    scale = max(np.abs(golden).max(), 1.0)
    np.testing.assert_allclose(
        out[0] / scale, golden / scale, rtol=1e-4, atol=2e-5
    )


def test_resample_batched_lengths(wav):
    n = 2000
    waves = np.zeros((2, n), np.float32)
    waves[0] = wav[:n]
    waves[1, : n // 2] = wav[n : n + n // 2]
    out, out_lens = resample_waveform(
        waves, 16000, 8000, lengths=np.array([n, n // 2], np.int32)
    )
    out = np.asarray(out)
    golden_full = golden_resample_single(wav[:n], 16000, 8000)
    golden_half = golden_resample_single(wav[n : n + n // 2], 16000, 8000)
    assert int(out_lens[0]) == len(golden_full)
    assert int(out_lens[1]) == len(golden_half)
    scale = max(np.abs(golden_half).max(), 1.0)
    np.testing.assert_allclose(
        out[1, : len(golden_half)] / scale, golden_half / scale,
        rtol=1e-4, atol=2e-5,
    )
    assert np.all(out[1, int(out_lens[1]) :] == 0.0)


# -------------------------------------------------------------------- vtln

def test_vtln_warp_properties():
    """Kaldi VTLN warp invariants (reference kaldi_signal.py:302-372):
    F(low)==low, F(high)==high, middle piece == freq/warp, continuity."""
    from openasr_tpu.ops.fbank import vtln_warp_freq

    low, high, vl, vh = 20.0, 8000.0, 100.0, 7500.0
    for warp in (0.9, 1.1):
        l = vl * max(1.0, warp)
        h = vh * min(1.0, warp)
        f = np.linspace(low, high, 2001)
        w = vtln_warp_freq(vl, vh, low, high, warp, f)
        assert abs(w[0] - low) < 1e-6
        assert abs(w[-1] - high) < 1e-6
        mid = (f > l) & (f < h)
        np.testing.assert_allclose(w[mid], f[mid] / warp, rtol=1e-12)
        # piecewise-linear and continuous: small steps -> small jumps
        assert np.max(np.abs(np.diff(w))) < 3 * (f[1] - f[0]) / min(warp, 1.0)
        # monotone increasing
        assert np.all(np.diff(w) > 0)


def test_mel_banks_vtln():
    from openasr_tpu.ops.fbank import FbankConfig, mel_banks

    base = mel_banks(FbankConfig(num_mel_bins=23))
    warped = mel_banks(FbankConfig(num_mel_bins=23, vtln_warp=1.1))
    assert warped.shape == base.shape
    assert not np.allclose(warped, base)
    assert warped.min() >= 0.0 and warped.max() <= 1.0 + 1e-6
    # every bin still has support
    assert np.all(warped.sum(axis=1) > 0)
    # warp factor 1.0 is exactly the unwarped bank
    np.testing.assert_array_equal(
        mel_banks(FbankConfig(num_mel_bins=23, vtln_warp=1.0)), base
    )


def test_fbank_with_vtln_runs(wav):
    from openasr_tpu.ops.fbank import FbankConfig, fbank

    cfg = FbankConfig(num_mel_bins=23, dither=0.0, vtln_warp=0.95)
    feats, lens = fbank(wav[None, :8000], np.array([8000], np.int32), cfg)
    assert np.isfinite(np.asarray(feats)).all()
    base, _ = fbank(
        wav[None, :8000], np.array([8000], np.int32),
        FbankConfig(num_mel_bins=23, dither=0.0),
    )
    assert not np.allclose(np.asarray(feats), np.asarray(base))
