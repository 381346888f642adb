"""Kaldi ark/scp matrix IO (NumPy, from the Kaldi serialization format spec).

Capability parity with the reference's vendored reader
(reference: src/third_party/kaldi_io.py:319-449 read_mat/read_mat_scp/
read_mat_ark): binary float/double matrices, all three compressed-matrix
formats, text-mode matrices, pipe inputs, and scp `path:offset` addressing.
Plus a binary float-matrix writer for data prep and tests.
"""

from __future__ import annotations

import io
import struct
import subprocess
import threading
from typing import BinaryIO, Iterator, Tuple

import numpy as np


def open_or_fd(path: str, mode: str = "rb"):
    """Open a file, handling 'pipe' (trailing '|' / leading '|') and
    'path:offset' addressing (reference: src/third_party/kaldi_io.py:36)."""
    offset = None
    if path.rstrip().endswith("|"):
        proc = subprocess.Popen(
            path.rstrip()[:-1], shell=True, stdout=subprocess.PIPE
        )
        return proc.stdout
    if path.lstrip().startswith("|"):
        proc = subprocess.Popen(
            path.lstrip()[1:], shell=True, stdin=subprocess.PIPE
        )
        return proc.stdin
    if ":" in path:
        head, tail = path.rsplit(":", 1)
        if tail.isdigit():
            path, offset = head, int(tail)
    f = open(path, mode)
    if offset is not None:
        f.seek(offset)
    return f


def _read_token(f: BinaryIO) -> bytes:
    tok = b""
    while True:
        c = f.read(1)
        if not c or c == b" ":
            break
        tok += c
    return tok


def _read_int32(f: BinaryIO) -> int:
    size = f.read(1)
    assert size == b"\x04", f"Expected int32 size byte, got {size!r}"
    return struct.unpack("<i", f.read(4))[0]


def _read_compressed(f: BinaryIO, fmt: int) -> np.ndarray:
    """Kaldi CompressedMatrix: format 1 = per-column uint8 with percentile
    headers, 2 = uint16, 3 = uint8 (row-major)."""
    min_value, rng = struct.unpack("<ff", f.read(8))
    rows, cols = struct.unpack("<ii", f.read(8))
    if fmt == 1:
        headers = np.frombuffer(f.read(8 * cols), dtype="<u2").reshape(cols, 4)
        pct = min_value + rng * headers.astype(np.float64) / 65535.0
        data = np.frombuffer(f.read(rows * cols), dtype=np.uint8)
        data = data.reshape(cols, rows).astype(np.float64)
        p0, p25, p75, p100 = (pct[:, i : i + 1] for i in range(4))
        low = p0 + (p25 - p0) * (data / 64.0)
        mid = p25 + (p75 - p25) * ((data - 64.0) / 128.0)
        high = p75 + (p100 - p75) * ((data - 192.0) / 63.0)
        out = np.where(data <= 64, low, np.where(data <= 192, mid, high))
        return out.T.astype(np.float32)
    if fmt == 2:
        data = np.frombuffer(f.read(2 * rows * cols), dtype="<u2")
        return (min_value + rng * data.astype(np.float64) / 65535.0).reshape(
            rows, cols
        ).astype(np.float32)
    if fmt == 3:
        data = np.frombuffer(f.read(rows * cols), dtype=np.uint8)
        return (min_value + rng * data.astype(np.float64) / 255.0).reshape(
            rows, cols
        ).astype(np.float32)
    raise ValueError(f"Unknown compressed matrix format {fmt}")


def _read_text_mat(f: BinaryIO, first: bytes) -> np.ndarray:
    buf = first
    while b"]" not in buf:
        chunk = f.read(4096)
        if not chunk:
            break
        buf += chunk
    text = buf.decode("utf-8")
    text = text[text.index("[") + 1 : text.index("]")]
    rows = [r.split() for r in text.strip().split("\n") if r.strip()]
    return np.array(rows, dtype=np.float32)


class _Pushback:
    """Minimal read(n) wrapper serving a prefix of already-read bytes
    before the underlying stream — lets the FM fast path read its header
    in one call and still fall back to the byte-wise parser for the other
    matrix flavors without seeking (pipes cannot seek)."""

    def __init__(self, prefix: bytes, f: BinaryIO):
        self._prefix = prefix
        self._f = f

    def read(self, n: int = -1) -> bytes:
        if self._prefix:
            if n < 0:
                out, self._prefix = self._prefix, b""
                return out + self._f.read(n)
            out, self._prefix = self._prefix[:n], self._prefix[n:]
            if len(out) < n:
                out += self._f.read(n - len(out))
            return out
        return self._f.read(n)


def read_mat_fd(f: BinaryIO, writable: bool = True) -> np.ndarray:
    """One matrix from an open stream.  writable=False skips the final
    defensive copy for float32 matrices (the result may be a read-only
    view of the read buffer) — the batch collates copy rows into the
    padded batch array anyway, and the copy measured ~15% of the offline
    data pipeline."""
    binary = f.read(2)
    if binary == b"\x00B":
        # Fast path: the overwhelmingly common "FM \x04<rows>\x04<cols>"
        # float-matrix header in ONE read instead of ~8 byte-wise reads
        # (header parsing was ~20% of pipeline time at 9 reads/matrix).
        hdr = f.read(13)
        if len(hdr) == 13 and hdr[:4] == b"FM \x04" and hdr[8:9] == b"\x04":
            rows = struct.unpack("<i", hdr[4:8])[0]
            cols = struct.unpack("<i", hdr[9:13])[0]
            data = np.frombuffer(f.read(4 * rows * cols), dtype="<f4")
            data = data.reshape(rows, cols)
            return data.copy() if writable else data
        f = _Pushback(hdr, f)
        tok = _read_token(f)
        if tok == b"FM":
            rows, cols = _read_int32(f), _read_int32(f)
            data = np.frombuffer(f.read(4 * rows * cols), dtype="<f4")
            data = data.reshape(rows, cols)
            return data.copy() if writable else data
        if tok == b"DM":
            rows, cols = _read_int32(f), _read_int32(f)
            data = np.frombuffer(f.read(8 * rows * cols), dtype="<f8")
            return data.reshape(rows, cols).astype(np.float32)
        if tok == b"CM":
            return _read_compressed(f, 1)
        if tok == b"CM2":
            return _read_compressed(f, 2)
        if tok == b"CM3":
            return _read_compressed(f, 3)
        raise ValueError(f"Unknown matrix token {tok!r}")
    return _read_text_mat(f, binary)


_fd_cache_local = threading.local()


def _cached_ark_fd(path: str, offset: int) -> BinaryIO:
    """Thread-local cache of open ark file handles for 'path:offset'
    reads: a training epoch issues one read_mat per utterance against a
    handful of ark files, and open/close was ~10% of pipeline time.
    Thread-local because prefetch threads seek independently."""
    cache = getattr(_fd_cache_local, "cache", None)
    if cache is None:
        cache = _fd_cache_local.cache = {}
    f = cache.get(path)
    if f is None or f.closed:
        if len(cache) >= 32:
            for old in cache.values():
                old.close()
            cache.clear()
        f = cache[path] = open(path, "rb")
    f.seek(offset)
    return f


def read_mat(path: str, writable: bool = True) -> np.ndarray:
    """Read one matrix from 'file', 'file:offset', or 'cmd |'."""
    if (
        ":" in path
        and not path.rstrip().endswith("|")
        and not path.lstrip().startswith("|")
    ):
        head, tail = path.rsplit(":", 1)
        if tail.isdigit():
            return read_mat_fd(
                _cached_ark_fd(head, int(tail)), writable=writable
            )
    f = open_or_fd(path)
    try:
        return read_mat_fd(f, writable=writable)
    finally:
        f.close()


def read_mat_scp(scp_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    with open(scp_path, "r") as f:
        for line in f:
            fields = line.strip().split(" ", 1)
            if len(fields) != 2:
                continue
            yield fields[0], read_mat(fields[1])


def read_mat_ark(ark_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    f = open_or_fd(ark_path)
    try:
        while True:
            key = _read_token(f)
            if not key:
                break
            yield key.decode("utf-8"), read_mat_fd(f)
    finally:
        f.close()


def write_mat(f: BinaryIO, mat: np.ndarray, key: str) -> int:
    """Append one binary float matrix; returns the value's byte offset
    (for building scp files)."""
    f.write(key.encode("utf-8") + b" ")
    offset = f.tell()
    f.write(b"\x00BFM ")
    rows, cols = mat.shape
    f.write(b"\x04" + struct.pack("<i", rows))
    f.write(b"\x04" + struct.pack("<i", cols))
    f.write(mat.astype("<f4").tobytes())
    return offset


def write_ark_scp(path_prefix: str, mats: Iterator[Tuple[str, np.ndarray]]):
    """Write an ark + scp pair from (key, matrix) pairs."""
    ark_path = path_prefix + ".ark"
    scp_path = path_prefix + ".scp"
    with open(ark_path, "wb") as fa, open(scp_path, "w") as fs:
        for key, mat in mats:
            offset = write_mat(fa, mat, key)
            fs.write(f"{key} {ark_path}:{offset}\n")


# --------------------------------------------------------------- int vectors
# (alignments; reference: src/third_party/kaldi_io.py:124-203)

def read_vec_int_fd(f: BinaryIO) -> np.ndarray:
    binary = f.read(2)
    if binary == b"\x00B":
        n = _read_int32(f)
        # each element is stored as (int8 size marker == 4, int32 value)
        raw = np.frombuffer(
            f.read(5 * n), dtype=[("size", "i1"), ("value", "<i4")], count=n
        )
        if n:
            assert raw["size"][0] == 4
        return raw["value"].copy()
    text = (binary + f.readline()).decode("utf-8").replace(
        "[", " "
    ).replace("]", " ")
    return np.array(text.split(), dtype=np.int64)


def read_vec_int(path: str) -> np.ndarray:
    f = open_or_fd(path)
    try:
        return read_vec_int_fd(f)
    finally:
        f.close()


def read_vec_int_ark(ark_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    f = open_or_fd(ark_path)
    try:
        while True:
            key = _read_token(f)
            if not key:
                break
            yield key.decode("utf-8"), read_vec_int_fd(f)
    finally:
        f.close()


# alignments are int vectors (reference: kaldi_io.py:124)
read_ali_ark = read_vec_int_ark


def write_vec_int(f: BinaryIO, v: np.ndarray, key: str) -> int:
    f.write(key.encode("utf-8") + b" ")
    offset = f.tell()
    f.write(b"\x00B")
    f.write(b"\x04" + struct.pack("<i", len(v)))
    out = np.empty(len(v), dtype=[("size", "i1"), ("value", "<i4")])
    out["size"] = 4
    out["value"] = np.asarray(v, dtype=np.int32)
    f.write(out.tobytes())
    return offset


# ------------------------------------------------------------- float vectors
# (ivectors, confidences; reference: src/third_party/kaldi_io.py:206-318)

def read_vec_flt_fd(f: BinaryIO) -> np.ndarray:
    binary = f.read(2)
    if binary == b"\x00B":
        tok = _read_token(f)
        if tok == b"FV":
            n = _read_int32(f)
            return np.frombuffer(f.read(4 * n), dtype="<f4").copy()
        if tok == b"DV":
            n = _read_int32(f)
            return np.frombuffer(f.read(8 * n), dtype="<f8").copy()
        raise ValueError(f"Unknown vector token {tok!r}")
    text = (binary + f.readline()).decode("utf-8").replace(
        "[", " "
    ).replace("]", " ")
    return np.array(text.split(), dtype=np.float64)


def read_vec_flt(path: str) -> np.ndarray:
    f = open_or_fd(path)
    try:
        return read_vec_flt_fd(f)
    finally:
        f.close()


def read_vec_flt_ark(ark_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    f = open_or_fd(ark_path)
    try:
        while True:
            key = _read_token(f)
            if not key:
                break
            yield key.decode("utf-8"), read_vec_flt_fd(f)
    finally:
        f.close()


def read_vec_flt_scp(scp_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    with open(scp_path, "r") as f:
        for line in f:
            fields = line.strip().split(" ", 1)
            if len(fields) != 2:
                continue
            yield fields[0], read_vec_flt(fields[1])


def write_vec_flt(f: BinaryIO, v: np.ndarray, key: str) -> int:
    f.write(key.encode("utf-8") + b" ")
    offset = f.tell()
    v = np.asarray(v)
    f.write(b"\x00B")
    if v.dtype == np.float64:
        f.write(b"DV ")
    else:
        v = v.astype("<f4")
        f.write(b"FV ")
    f.write(b"\x04" + struct.pack("<i", len(v)))
    f.write(v.tobytes())
    return offset


# ---------------------------------------------------------------- posteriors
# C++ vector<vector<pair<int32, float>>> — the outer vector is time, inner
# entries are (index, value) records (reference: kaldi_io.py:494-554)

def read_post_fd(f: BinaryIO):
    binary = f.read(2)
    assert binary == b"\x00B", "posteriors are binary-only"
    n_frames = _read_int32(f)
    post = []
    rec = np.dtype(
        [("si", "i1"), ("idx", "<i4"), ("sp", "i1"), ("val", "<f4")]
    )
    for _ in range(n_frames):
        n = _read_int32(f)
        raw = np.frombuffer(f.read(10 * n), dtype=rec, count=n)
        if n:
            assert raw["si"][0] == 4 and raw["sp"][0] == 4
        post.append(
            [(int(i), float(v)) for i, v in zip(raw["idx"], raw["val"])]
        )
    return post


def read_post_ark(ark_path: str):
    f = open_or_fd(ark_path)
    try:
        while True:
            key = _read_token(f)
            if not key:
                break
            yield key.decode("utf-8"), read_post_fd(f)
    finally:
        f.close()


# confusion networks use the Posterior format (reference: kaldi_io.py:494)
read_cnet_ark = read_post_ark


def write_post(f: BinaryIO, post, key: str) -> int:
    f.write(key.encode("utf-8") + b" ")
    offset = f.tell()
    f.write(b"\x00B")
    f.write(b"\x04" + struct.pack("<i", len(post)))
    for frame in post:
        f.write(b"\x04" + struct.pack("<i", len(frame)))
        for idx, val in frame:
            f.write(b"\x04" + struct.pack("<i", int(idx)))
            f.write(b"\x04" + struct.pack("<f", float(val)))
    return offset
