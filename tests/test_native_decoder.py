"""Native C++ CTC prefix beam decoder vs the NumPy oracle."""

import os
import subprocess
import time

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native",
                          "ctc_decoder")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                   capture_output=True)


def _random_log_probs(b, t, v, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v).astype(np.float32) * 2
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def test_native_matches_python_oracle():
    from openasr_tpu.ops.prefix_beam import (
        CTCPrefixBeamDecoder,
        NativeCTCPrefixBeamDecoder,
    )

    b, t, v = 4, 30, 12
    lp = _random_log_probs(b, t, v)
    lengths = np.array([30, 25, 20, 10], np.int32)
    kwargs = dict(beam_width=8, blank_id=v - 1, cutoff_top_n=v,
                  cutoff_logp=-100.0)
    py = CTCPrefixBeamDecoder(**kwargs)
    cc = NativeCTCPrefixBeamDecoder(**kwargs)

    py_out = py.decode_batch(lp, lengths)
    cc_out = cc.decode_batch(lp, lengths)
    for i in range(b):
        assert len(cc_out[i]) == len(py_out[i])
        for hp, hc in zip(py_out[i], cc_out[i]):
            assert hp.tokens == hc.tokens, (i, hp.tokens, hc.tokens)
            assert np.isclose(hp.score, hc.score, rtol=1e-4, atol=1e-4)


def test_native_with_cutoffs():
    from openasr_tpu.ops.prefix_beam import (
        CTCPrefixBeamDecoder,
        NativeCTCPrefixBeamDecoder,
    )

    b, t, v = 2, 20, 30
    lp = _random_log_probs(b, t, v, seed=3)
    lengths = np.array([20, 15], np.int32)
    kwargs = dict(beam_width=5, blank_id=v - 1, cutoff_top_n=8,
                  cutoff_logp=-12.0)
    py_out = CTCPrefixBeamDecoder(**kwargs).decode_batch(lp, lengths)
    cc_out = NativeCTCPrefixBeamDecoder(**kwargs).decode_batch(lp, lengths)
    for i in range(b):
        assert py_out[i][0].tokens == cc_out[i][0].tokens


def test_native_speedup():
    from openasr_tpu.ops.prefix_beam import (
        CTCPrefixBeamDecoder,
        NativeCTCPrefixBeamDecoder,
    )

    b, t, v = 8, 100, 100
    lp = _random_log_probs(b, t, v, seed=1)
    lengths = np.full((b,), t, np.int32)
    kwargs = dict(beam_width=10, blank_id=v - 1, cutoff_top_n=20,
                  cutoff_logp=-20.0)

    t0 = time.time()
    CTCPrefixBeamDecoder(**kwargs).decode_batch(lp, lengths)
    py_time = time.time() - t0
    t0 = time.time()
    NativeCTCPrefixBeamDecoder(**kwargs).decode_batch(lp, lengths)
    cc_time = time.time() - t0
    # the native path should be dramatically faster; keep margin loose so
    # the assertion survives CPU contention from parallel test runs
    assert cc_time < py_time / 2, (py_time, cc_time)


def test_make_decoder_prefers_native():
    from openasr_tpu.ops.prefix_beam import (
        NativeCTCPrefixBeamDecoder,
        make_decoder,
    )

    dec = make_decoder(beam_width=4, blank_id=0)
    assert isinstance(dec, NativeCTCPrefixBeamDecoder)
