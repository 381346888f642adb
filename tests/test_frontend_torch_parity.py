"""Feature-frontend parity against the reference's ACTUAL torch code.

The other frontend tests validate against self-authored NumPy goldens; a
shared misreading of Kaldi semantics would pass both.  This module runs the
reference's `src/third_party/kaldi_signal.py` (torch, imported read-only)
on the committed test audio with dither=0 and requires our batched JAX
implementations (`ops/fbank.py` fbank/spectrogram/mfcc/resample_waveform)
to agree to float32 tolerance.

Skipped when the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

import jax  # noqa: F401  (imports openasr_tpu side effects via conftest)

from openasr_tpu.ops.fbank import (
    FbankConfig,
    fbank,
    mfcc,
    resample_waveform,
    spectrogram,
)

REF = "/root/reference/src"
DATA = os.path.join(os.path.dirname(__file__), "data")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_ks():
    import torch

    # the reference targets torch<=1.7's `torch.rfft(x, 1, onesided=True)`
    # (removed upstream); shim it with the modern torch.fft API returning
    # the old stacked real/imag layout so the reference code runs unchanged
    if not hasattr(torch, "rfft"):
        def _legacy_rfft(x, signal_ndim, normalized=False, onesided=True):
            assert signal_ndim == 1 and onesided and not normalized
            c = torch.fft.rfft(x, dim=-1)
            return torch.stack([c.real, c.imag], dim=-1)

        torch.rfft = _legacy_rfft
    # python<=3.8's fractions.gcd, used by the reference's resampler
    import fractions
    import math

    if not hasattr(fractions, "gcd"):
        fractions.gcd = math.gcd
    sys.path.insert(0, REF)
    import third_party.kaldi_signal as ks

    yield ks
    sys.path.remove(REF)


@pytest.fixture(scope="module")
def wave():
    from scipy.io import wavfile

    rate, data = wavfile.read(os.path.join(DATA, "BAC009S0764W0121.wav"))
    assert rate == 16000
    return data.astype(np.float32)[:24000]  # 1.5 s


def _batched(wave, n_pad=517):
    """[1, N+pad] zero-padded batch + length vector, to prove the batched
    padded path matches the reference's exact-length computation."""
    waves = np.zeros((1, len(wave) + n_pad), np.float32)
    waves[0, : len(wave)] = wave
    return waves, np.array([len(wave)], np.int32)


def test_fbank_matches_reference_torch(ref_ks, wave):
    import torch

    ref = ref_ks.fbank(
        torch.from_numpy(wave[None, :]), num_mel_bins=40, dither=0.0
    ).numpy()

    waves, lengths = _batched(wave)
    cfg = FbankConfig(num_mel_bins=40, dither=0.0)
    feats, feat_lengths = fbank(waves, lengths, cfg)
    feats = np.asarray(feats)
    assert int(feat_lengths[0]) == ref.shape[0]
    np.testing.assert_allclose(
        feats[0, : ref.shape[0]], ref, rtol=1e-4, atol=2e-3
    )


def test_fbank_energy_and_vtln_match_reference_torch(ref_ks, wave):
    import torch

    ref = ref_ks.fbank(
        torch.from_numpy(wave[None, :]), num_mel_bins=23, dither=0.0,
        use_energy=True, vtln_warp=1.1,
    ).numpy()

    waves, lengths = _batched(wave)
    cfg = FbankConfig(
        num_mel_bins=23, dither=0.0, use_energy=True, vtln_warp=1.1
    )
    feats, feat_lengths = fbank(waves, lengths, cfg)
    assert int(feat_lengths[0]) == ref.shape[0]
    np.testing.assert_allclose(
        np.asarray(feats)[0, : ref.shape[0]], ref, rtol=1e-4, atol=2e-3
    )


def test_spectrogram_matches_reference_torch(ref_ks, wave):
    import torch

    ref = ref_ks.spectrogram(
        torch.from_numpy(wave[None, :]), dither=0.0
    ).numpy()

    waves, lengths = _batched(wave)
    cfg = FbankConfig(dither=0.0)
    feats, feat_lengths = spectrogram(waves, lengths, cfg)
    assert int(feat_lengths[0]) == ref.shape[0]
    np.testing.assert_allclose(
        np.asarray(feats)[0, : ref.shape[0]], ref, rtol=1e-4, atol=2e-3
    )


def test_mfcc_matches_reference_torch(ref_ks, wave):
    import torch

    ref = ref_ks.mfcc(
        torch.from_numpy(wave[None, :]), num_mel_bins=23, num_ceps=13,
        dither=0.0,
    ).numpy()

    waves, lengths = _batched(wave)
    cfg = FbankConfig(num_mel_bins=23, dither=0.0)
    feats, feat_lengths = mfcc(waves, lengths, cfg, num_ceps=13)
    assert int(feat_lengths[0]) == ref.shape[0]
    np.testing.assert_allclose(
        np.asarray(feats)[0, : ref.shape[0]], ref, rtol=1e-4, atol=2e-3
    )


def test_mfcc_energy_matches_reference_torch(ref_ks, wave):
    import torch

    ref = ref_ks.mfcc(
        torch.from_numpy(wave[None, :]), num_mel_bins=23, num_ceps=13,
        dither=0.0, use_energy=True,
    ).numpy()

    waves, lengths = _batched(wave)
    cfg = FbankConfig(num_mel_bins=23, dither=0.0, use_energy=True)
    feats, feat_lengths = mfcc(waves, lengths, cfg, num_ceps=13)
    assert int(feat_lengths[0]) == ref.shape[0]
    np.testing.assert_allclose(
        np.asarray(feats)[0, : ref.shape[0]], ref, rtol=1e-4, atol=2e-3
    )


@pytest.mark.parametrize("new_freq", [8000, 22050])
def test_resample_matches_reference_torch(ref_ks, wave, new_freq):
    import torch

    ref = ref_ks.resample_waveform(
        torch.from_numpy(wave[None, :]), 16000.0, float(new_freq)
    ).numpy()

    out = np.asarray(resample_waveform(wave[None, :], 16000, new_freq))
    assert out.shape == ref.shape
    # atol 0.05 on an int16-scale signal (±32768) ≈ 2e-6 of full scale:
    # f32 accumulation-order noise between the gather-reduce and the
    # reference's conv1d
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-2)
