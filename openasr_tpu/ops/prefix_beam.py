"""CTC prefix beam search (Hannun et al. 2014), host-side.

Replaces the reference's external `ctcdecode` C++ dependency
(reference: src/utils.py:246-253, src/infer.py:99-112) with an in-repo
implementation: log-probs come from the jitted model; the search runs on
host.  A C++ fast path (native/ctc_decoder) shadows this module when the
shared library is built; this NumPy version is the always-available
fallback and the correctness oracle for the native one.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

LOG_ZERO = -math.inf


def log_add(a: float, b: float) -> float:
    if a == LOG_ZERO:
        return b
    if b == LOG_ZERO:
        return a
    m = a if a > b else b
    return m + math.log1p(math.exp(-abs(a - b)))


@dataclass
class Hypothesis:
    tokens: Tuple[int, ...]
    score: float
    times: Tuple[int, ...] = field(default_factory=tuple)


class CTCPrefixBeamDecoder:
    """n-best CTC prefix beam search over [T, V] log-probs."""

    def __init__(
        self,
        beam_width: int = 10,
        blank_id: int = 0,
        cutoff_top_n: int = 40,
        cutoff_logp: float = -20.0,
    ):
        self.beam_width = beam_width
        self.blank_id = blank_id
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_logp = cutoff_logp

    def decode(self, log_probs: np.ndarray, length: int | None = None
               ) -> List[Hypothesis]:
        t_max, vocab = log_probs.shape
        if length is not None:
            t_max = min(t_max, int(length))
        blank = self.blank_id

        # prefix -> (log p ending in blank, log p ending in non-blank)
        beams: Dict[Tuple[int, ...], Tuple[float, float]] = {
            (): (0.0, LOG_ZERO)
        }
        for t in range(t_max):
            frame = log_probs[t]
            top_n = min(self.cutoff_top_n, vocab)
            cand = np.argpartition(frame, -top_n)[-top_n:]
            cand = cand[frame[cand] >= self.cutoff_logp]
            if blank not in cand:
                cand = np.append(cand, blank)

            new_beams: Dict[Tuple[int, ...], Tuple[float, float]] = {}

            def acc(prefix, pb=LOG_ZERO, pnb=LOG_ZERO):
                old_pb, old_pnb = new_beams.get(prefix, (LOG_ZERO, LOG_ZERO))
                new_beams[prefix] = (log_add(old_pb, pb), log_add(old_pnb, pnb))

            for prefix, (p_b, p_nb) in beams.items():
                p_tot = log_add(p_b, p_nb)
                last = prefix[-1] if prefix else -1
                for c in cand:
                    lp = float(frame[c])
                    if c == blank:
                        acc(prefix, pb=p_tot + lp)
                    elif c == last:
                        # same symbol: extends non-blank stays same prefix;
                        # blank-separated repeat makes a new token
                        acc(prefix, pnb=p_nb + lp)
                        acc(prefix + (int(c),), pnb=p_b + lp)
                    else:
                        acc(prefix + (int(c),), pnb=p_tot + lp)

            # prune
            scored = sorted(
                new_beams.items(),
                key=lambda kv: log_add(*kv[1]),
                reverse=True,
            )[: self.beam_width]
            beams = dict(scored)

        out = [
            Hypothesis(tokens=prefix, score=log_add(pb, pnb))
            for prefix, (pb, pnb) in beams.items()
        ]
        out.sort(key=lambda h: h.score, reverse=True)
        return out

    def decode_batch(
        self, log_probs: np.ndarray, lengths: np.ndarray
    ) -> List[List[Hypothesis]]:
        return [
            self.decode(log_probs[i], int(lengths[i]))
            for i in range(log_probs.shape[0])
        ]


# ------------------------------------------------------------ native path

def _load_native():
    import ctypes
    import os

    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, "native", "ctc_decoder", "libctc_decoder.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    fn = lib.ctc_prefix_beam_decode_batch
    fn.restype = None
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    return fn


_NATIVE_FN = None
_NATIVE_TRIED = False


class NativeCTCPrefixBeamDecoder(CTCPrefixBeamDecoder):
    """C++ fast path (native/ctc_decoder), multithreaded over the batch.
    Same semantics as the NumPy oracle above."""

    def __init__(self, *args, num_threads: int = 8, max_out_len: int = 256,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.num_threads = num_threads
        self.max_out_len = max_out_len
        global _NATIVE_FN, _NATIVE_TRIED
        if not _NATIVE_TRIED:
            _NATIVE_FN = _load_native()
            _NATIVE_TRIED = True
        if _NATIVE_FN is None:
            raise RuntimeError(
                "libctc_decoder.so not built; run `make -C native/ctc_decoder`"
            )

    def decode_batch(self, log_probs, lengths) -> List[List[Hypothesis]]:
        import ctypes

        lp = np.ascontiguousarray(log_probs, dtype=np.float32)
        lens = np.ascontiguousarray(lengths, dtype=np.int32)
        b, t, v = lp.shape
        beam = self.beam_width
        out_tokens = np.zeros((b, beam, self.max_out_len), np.int32)
        out_lengths = np.zeros((b, beam), np.int32)
        out_scores = np.zeros((b, beam), np.float32)
        _NATIVE_FN(
            lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b, t, v,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            beam, self.blank_id, self.cutoff_top_n,
            ctypes.c_float(self.cutoff_logp), self.max_out_len,
            self.num_threads,
            out_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        result = []
        for i in range(b):
            hyps = [
                Hypothesis(
                    tokens=tuple(out_tokens[i, k, : out_lengths[i, k]]),
                    score=float(out_scores[i, k]),
                )
                for k in range(beam)
                if out_scores[i, k] > -np.finfo(np.float32).max
            ]
            result.append(hyps)
        return result

    def decode(self, log_probs, length=None):
        if length is None:
            length = log_probs.shape[0]
        return self.decode_batch(
            log_probs[None], np.array([length], np.int32)
        )[0]


def make_decoder(beam_width=10, blank_id=0, prefer_native=True, **kwargs):
    """Best available decoder: native C++ when built, NumPy fallback."""
    if prefer_native:
        try:
            return NativeCTCPrefixBeamDecoder(
                beam_width=beam_width, blank_id=blank_id, **kwargs
            )
        except RuntimeError:
            pass
    kwargs.pop("num_threads", None)
    kwargs.pop("max_out_len", None)
    return CTCPrefixBeamDecoder(beam_width=beam_width, blank_id=blank_id,
                                **kwargs)
