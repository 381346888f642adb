"""Decoding tests: CTC prefix beam search vs exhaustive enumeration."""

import itertools
import math

import numpy as np

from openasr_tpu.ops.prefix_beam import CTCPrefixBeamDecoder


def brute_force_ctc_best(log_probs, blank):
    """Enumerate all alignments, marginalize to label sequences, return the
    exact posterior per sequence."""
    t, v = log_probs.shape
    seq_logp = {}
    for path in itertools.product(range(v), repeat=t):
        lp = sum(log_probs[i, c] for i, c in enumerate(path))
        # collapse
        out = []
        prev = None
        for c in path:
            if c != prev and c != blank:
                out.append(c)
            prev = c
        key = tuple(out)
        if key in seq_logp:
            m = max(seq_logp[key], lp)
            seq_logp[key] = m + math.log(
                math.exp(seq_logp[key] - m) + math.exp(lp - m)
            )
        else:
            seq_logp[key] = lp
    return seq_logp


def test_prefix_beam_matches_bruteforce():
    rng = np.random.RandomState(0)
    t, v = 5, 4  # enumeration: 4^5 = 1024 paths
    logits = rng.randn(t, v).astype(np.float64) * 2
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    blank = v - 1

    exact = brute_force_ctc_best(log_probs, blank)
    exact_sorted = sorted(exact.items(), key=lambda kv: kv[1], reverse=True)

    dec = CTCPrefixBeamDecoder(beam_width=50, blank_id=blank, cutoff_top_n=v,
                               cutoff_logp=-100.0)
    hyps = dec.decode(log_probs)

    # with a wide beam the top hypothesis must be the exact argmax and its
    # score the exact marginal
    assert hyps[0].tokens == exact_sorted[0][0]
    assert math.isclose(hyps[0].score, exact_sorted[0][1], rel_tol=1e-6)
    # top-3 order agrees
    got3 = [h.tokens for h in hyps[:3]]
    want3 = [k for k, _ in exact_sorted[:3]]
    assert got3 == want3


def test_prefix_beam_respects_length():
    rng = np.random.RandomState(1)
    lp = rng.randn(10, 5)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    dec = CTCPrefixBeamDecoder(beam_width=5, blank_id=4)
    full = dec.decode(lp, 10)
    half = dec.decode(lp[:5], 5)
    trunc = dec.decode(lp, 5)
    assert [h.tokens for h in half] == [h.tokens for h in trunc]
    assert np.isclose(half[0].score, trunc[0].score)


def test_prefix_beam_peaked_distribution():
    # peaked logits -> greedy == beam
    lp = np.full((6, 4), -20.0)
    path = [0, 0, 3, 1, 1, 3]  # blank = 3 -> collapsed [0, 1]
    for i, c in enumerate(path):
        lp[i, c] = 0.0
    dec = CTCPrefixBeamDecoder(beam_width=4, blank_id=3)
    hyps = dec.decode(lp)
    assert hyps[0].tokens == (0, 1)
