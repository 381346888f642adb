"""Shared tiling arithmetic for the Pallas kernels.

One definition instead of per-kernel copies — tile/pad math drifting
between kernels is the same hazard the repo fixed once for the xplane
trace collector (utils/xprof.py).
"""

from __future__ import annotations


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m
