"""fbank numerical tests against an independent scalar NumPy golden.

The golden below is written directly from the Kaldi compute-fbank-feats
algorithm (frame → dither→DC→energy→preemph→window → pow2 pad → rFFT →
power → mel → log), independent of both the reference code and the JAX
implementation, so agreement is a real two-implementation check.
"""

import os

import numpy as np
import pytest

import jax

from openasr_tpu.ops.fbank import (
    EPSILON,
    FbankConfig,
    fbank,
    feature_window,
    mel_banks,
    num_frames_of,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def golden_fbank_single(wave: np.ndarray, cfg: FbankConfig) -> np.ndarray:
    """Scalar-loop Kaldi fbank for one waveform (dither disabled)."""
    ws, shift, nfft = cfg.window_size, cfg.window_shift, cfg.padded_window_size
    n = len(wave)
    if n < ws:
        return np.zeros((0, cfg.feat_dim), np.float32)
    t = 1 + (n - ws) // shift
    window = feature_window(cfg).astype(np.float64)
    mel = mel_banks(cfg).astype(np.float64)
    out = np.zeros((t, cfg.feat_dim), np.float64)
    for i in range(t):
        frame = wave[i * shift : i * shift + ws].astype(np.float64).copy()
        if cfg.remove_dc_offset:
            frame -= frame.mean()
        if cfg.use_energy and cfg.raw_energy:
            log_e = np.log(max((frame * frame).sum(), EPSILON))
        if cfg.preemphasis:
            prev = np.concatenate([[frame[0]], frame[:-1]])
            frame = frame - cfg.preemphasis * prev
        frame *= window
        spec = np.fft.rfft(frame, n=nfft)
        power = np.abs(spec) ** 2
        bins = np.log(np.maximum(mel @ power, EPSILON))
        if cfg.use_energy:
            out[i] = np.concatenate([[log_e], bins])
        else:
            out[i] = bins
    return out.astype(np.float32)


@pytest.fixture(scope="module")
def wav():
    from scipy.io import wavfile

    rate, data = wavfile.read(os.path.join(DATA, "BAC009S0764W0121.wav"))
    assert rate == 16000
    return data.astype(np.float32)


def test_fbank_matches_golden(wav):
    cfg = FbankConfig(num_mel_bins=40, dither=0.0)
    n = 16000  # 1 second
    wave = wav[:n]
    golden = golden_fbank_single(wave, cfg)

    waves = np.zeros((2, n + 640), np.float32)  # padded batch
    waves[0, :n] = wave
    waves[1, : n // 2] = wav[n : n + n // 2]
    lengths = np.array([n, n // 2], np.int32)
    feats, feat_lengths = fbank(waves, lengths, cfg)
    feats = np.asarray(feats)

    assert int(feat_lengths[0]) == golden.shape[0]
    got = feats[0, : golden.shape[0]]
    np.testing.assert_allclose(got, golden, rtol=2e-4, atol=2e-3)

    # second (shorter) utterance against its own golden
    golden2 = golden_fbank_single(wav[n : n + n // 2], cfg)
    assert int(feat_lengths[1]) == golden2.shape[0]
    np.testing.assert_allclose(
        feats[1, : golden2.shape[0]], golden2, rtol=2e-4, atol=2e-3
    )
    # padding frames are exactly zero
    assert np.all(feats[1, int(feat_lengths[1]) :] == 0.0)


def test_fbank_use_energy(wav):
    cfg = FbankConfig(num_mel_bins=23, use_energy=True, dither=0.0)
    wave = wav[:8000]
    golden = golden_fbank_single(wave, cfg)
    feats, lens = fbank(wave[None, :], np.array([8000], np.int32), cfg)
    assert cfg.feat_dim == 24
    np.testing.assert_allclose(
        np.asarray(feats)[0, : golden.shape[0]], golden, rtol=2e-4, atol=2e-3
    )


def test_num_frames():
    cfg = FbankConfig()
    lens = np.array([399, 400, 560, 16000])
    got = np.asarray(num_frames_of(lens, cfg))
    np.testing.assert_array_equal(got, [0, 1, 2, 98])


def test_dither_changes_output_only_with_key(wav):
    cfg = FbankConfig(num_mel_bins=40, dither=1.0)
    wave = wav[None, :16000].astype(np.float32)
    lens = np.array([16000], np.int32)
    a, _ = fbank(wave, lens, cfg)
    b, _ = fbank(wave, lens, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # no key: deterministic
    c, _ = fbank(wave, lens, cfg, dither_key=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_mel_banks_shape_and_partition():
    cfg = FbankConfig(num_mel_bins=80)
    mel = mel_banks(cfg)
    assert mel.shape == (80, 257)
    assert np.all(mel[:, -1] == 0.0)  # nyquist column zero
    assert mel.min() >= 0.0 and mel.max() <= 1.0
