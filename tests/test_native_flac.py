"""Native C++ FLAC decoder vs the pure-Python oracle: exact sample parity
on the committed real audio."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native",
                          "flac_decoder")
DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                   capture_output=True)
    import openasr_tpu.data.audio as A

    A._FLAC_NATIVE_TRIED = False  # re-probe after build
    yield
    A._FLAC_NATIVE_TRIED = False


@pytest.mark.parametrize(
    "name", ["103-1240-0005.flac", "100-121669-0000.flac"]
)
def test_native_flac_matches_python_oracle(name):
    import openasr_tpu.data.audio as A

    data = open(os.path.join(DATA, name), "rb").read()
    native = A._read_flac_native(data)
    assert native is not None, "native decoder unavailable or failed"
    sr_n, w_n = native

    # force the Python path
    A._FLAC_NATIVE, A._FLAC_NATIVE_TRIED = None, True
    try:
        sr_p, w_p = A.read_flac(os.path.join(DATA, name))
    finally:
        A._FLAC_NATIVE_TRIED = False

    assert sr_n == sr_p
    assert w_n.shape == w_p.shape
    np.testing.assert_array_equal(w_n, w_p)


def test_read_flac_prefers_native():
    import openasr_tpu.data.audio as A

    sr, w = A.read_flac(os.path.join(DATA, "103-1240-0005.flac"))
    assert sr == 16000 and w.ndim == 1 and len(w) > 16000
