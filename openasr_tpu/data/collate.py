"""Collates: sample dicts -> padded NumPy batches with quantized shapes.

Capability parity with the reference's collate classes
(reference: src/dataload/collates.py:23-176) and target construction
(reference: src/dataload/data_utils.py:88-108 gen_casual_targets), with one
TPU-specific addition: padded dimensions are rounded up onto a small
geometric ladder so XLA compiles a bounded set of static shapes instead of
one program per batch shape.

Batches are plain dicts of NumPy arrays (plus a "uttids" list), matching
the reference tuple contents field-for-field:
  ids [B,U] int32        decoder inputs, starts with <sos>
  labels [B,U] int32     shifted targets
  paddings [B,U] f32     1.0 at PADDED label positions (reference convention)
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np

from openasr_tpu.data import kaldi_io
from openasr_tpu.data.audio import load_wave
from openasr_tpu.data.tokenizer import EOS_ID, SOS_ID


# ------------------------------------------------------- shape quantization

def geometric_ladder(lo: int = 8, hi: int = 1 << 20, ratio: float = 1.25) -> List[int]:
    """Increasing sizes lo, ~lo*r, ... rounded to multiples of 8."""
    out = [lo]
    x = float(lo)
    while out[-1] < hi:
        x *= ratio
        v = int(math.ceil(x / 8.0) * 8)
        if v > out[-1]:
            out.append(v)
    return out


_LADDER = geometric_ladder()


def quantize(n: int, enable: bool = True) -> int:
    """Round n up to the ladder (bounds compiled-shape count; padding waste
    <= 25%, usually far less because batches are length-sorted)."""
    if not enable:
        return n
    for v in _LADDER:
        if v >= n:
            return v
    return n


# ---------------------------------------------------------- target building

def pad_list(
    seqs: Sequence[np.ndarray], pad_value, max_len: Optional[int] = None
) -> np.ndarray:
    n = len(seqs)
    ml = max(len(s) for s in seqs)
    ml = max_len if max_len is not None else ml
    out = np.full((n, ml), pad_value, dtype=np.asarray(seqs[0]).dtype)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def gen_causal_targets(
    idslist: List[List[int]],
    add_eos: bool,
    sos_id: int = SOS_ID,
    eos_id: int = EOS_ID,
    max_len: Optional[int] = None,
):
    """-> (ids, labels, paddings); reference: src/dataload/data_utils.py:88-108."""
    with_sym = [
        [sos_id] + ids + ([eos_id] if add_eos else []) for ids in idslist
    ]
    lens = [len(s) for s in with_sym]
    ml = max(lens)
    if max_len is not None:
        ml = max(ml, max_len + 1)
    raw = np.full((len(with_sym), ml), eos_id, dtype=np.int32)
    pad = np.ones((len(with_sym), ml), dtype=np.float32)
    for i, s in enumerate(with_sym):
        raw[i, : len(s)] = s
        pad[i, : len(s)] = 0.0
    ids = raw[:, :-1]
    labels = raw[:, 1:]
    paddings = pad[:, 1:]
    return ids, labels, paddings


# ------------------------------------------------------------ batch loaders

def load_wave_batch(paths: List[str], quantize_shapes=True,
                    expected_rate=None):
    """expected_rate, when given (the model signal config's sample_rate),
    is validated against every decoded file: fbank geometry (window,
    shift, mel banks) is derived from it, so an 8 kHz wav in a 16 kHz
    config would silently produce features at the wrong time/frequency
    scale."""
    waves, lengths = [], []
    for p in paths:
        rate, w = load_wave(p)
        if expected_rate is not None and int(rate) != int(expected_rate):
            raise ValueError(
                f"{p}: sample rate {rate} != configured "
                f"{expected_rate}; resample offline "
                "(ops/fbank.py:resample_waveform) or fix signal.sample_rate"
            )
        waves.append(w.astype(np.float32))
        lengths.append(len(w))
    n = quantize(max(lengths), quantize_shapes)
    out = np.zeros((len(waves), n), np.float32)
    for i, w in enumerate(waves):
        out[i, : len(w)] = w
    return out, np.asarray(lengths, np.int32)


def load_feat_batch(paths: List[str], quantize_shapes=True):
    # writable=False: rows are copied into the padded batch below, so the
    # reader's defensive copy would be pure waste; np.empty + zeroing only
    # the padding tail (instead of np.zeros over the whole [B,T,D] block)
    # halves the assembly traffic.  Together with the reader fast paths
    # this measured ~1.9x single-worker pipeline throughput.
    feats, lengths = [], []
    for p in paths:
        m = kaldi_io.read_mat(p, writable=False)
        feats.append(m)
        lengths.append(m.shape[0])
    t = quantize(max(lengths), quantize_shapes)
    out = np.empty((len(feats), t, feats[0].shape[1]), np.float32)
    for i, m in enumerate(feats):
        out[i, : m.shape[0]] = m
        out[i, m.shape[0]:] = 0.0
    return out, np.asarray(lengths, np.int32)


# ----------------------------------------------------------------- collates

class FeatureCollate:
    """Offline features + causal targets
    (reference: src/dataload/collates.py:70-94)."""

    def __init__(self, tokenizer, add_eos=False, label_type="tokens",
                 quantize_shapes=True):
        self.tokenizer = tokenizer
        self.add_eos = add_eos
        self.label_type = label_type
        self.quantize_shapes = quantize_shapes

    def __call__(self, batch: List[dict]) -> Dict:
        feats, feat_lengths = load_feat_batch(
            [d["feat"] for d in batch], self.quantize_shapes
        )
        trans = [d[self.label_type] for d in batch]
        rawids = [self.tokenizer.encode(t) for t in trans]
        umax = quantize(
            max(len(r) for r in rawids) + 2, self.quantize_shapes
        )
        ids, labels, paddings = gen_causal_targets(
            rawids, self.add_eos, max_len=umax
        )
        return {
            "uttids": [d["uttid"] for d in batch],
            "feats": feats,
            "feat_lengths": feat_lengths,
            "ids": ids,
            "labels": labels,
            "paddings": paddings,
        }


class WaveCollate:
    """Online waves + causal targets
    (reference: src/dataload/collates.py:45-67 WaveSampleCollate)."""

    def __init__(self, tokenizer, add_eos=False, label_type="tokens",
                 quantize_shapes=True, expected_rate=None):
        self.tokenizer = tokenizer
        self.add_eos = add_eos
        self.label_type = label_type
        self.quantize_shapes = quantize_shapes
        self.expected_rate = expected_rate

    def __call__(self, batch: List[dict]) -> Dict:
        waves, wave_lengths = load_wave_batch(
            [d["feat"] for d in batch], self.quantize_shapes,
            expected_rate=self.expected_rate,
        )
        rawids = [self.tokenizer.encode(d[self.label_type]) for d in batch]
        umax = quantize(max(len(r) for r in rawids) + 2, self.quantize_shapes)
        ids, labels, paddings = gen_causal_targets(
            rawids, self.add_eos, max_len=umax
        )
        return {
            "uttids": [d["uttid"] for d in batch],
            "waves": waves,
            "wave_lengths": wave_lengths,
            "ids": ids,
            "labels": labels,
            "paddings": paddings,
        }


class WaveOnlyCollate:
    """Waves without labels (CPC pretraining,
    reference: src/dataload/collates.py:37-42 waveCollate)."""

    def __init__(self, quantize_shapes=True, path_key="feat"):
        self.quantize_shapes = quantize_shapes
        self.path_key = path_key

    def __call__(self, batch: List[dict]) -> Dict:
        waves, wave_lengths = load_wave_batch(
            [d[self.path_key] for d in batch], self.quantize_shapes
        )
        return {
            "uttids": [d["uttid"] for d in batch],
            "waves": waves,
            "wave_lengths": wave_lengths,
        }


class PhoneCharCollate:
    """Phone ids in, char causal targets out
    (reference: src/dataload/collates.py:97-112).  Unlike the reference —
    which padded phones with id 1 (<sos>) and recounted lengths by value —
    phones pad with <eos> and lengths are tracked directly."""

    def __init__(self, tokenizer_phone, tokenizer_char, add_eos=False,
                 quantize_shapes=True):
        self.tokenizer_phone = tokenizer_phone
        self.tokenizer_char = tokenizer_char
        self.add_eos = add_eos
        self.quantize_shapes = quantize_shapes

    def phones_of(self, batch):
        phones = [
            np.asarray(self.tokenizer_phone.encode(d["phones"]), np.int32)
            for d in batch
        ]
        lens = np.asarray([len(p) for p in phones], np.int32)
        pmax = quantize(int(lens.max()), self.quantize_shapes)
        return pad_list(phones, EOS_ID, pmax), lens

    def chars_of(self, batch):
        rawids = [self.tokenizer_char.encode(d["tokens"]) for d in batch]
        umax = quantize(max(len(r) for r in rawids) + 2, self.quantize_shapes)
        return gen_causal_targets(rawids, self.add_eos, max_len=umax)

    def __call__(self, batch: List[dict]) -> Dict:
        xs, len_xs = self.phones_of(batch)
        ids, labels, paddings = self.chars_of(batch)
        return {
            "uttids": [d["uttid"] for d in batch],
            "phones": xs,
            "phone_lengths": len_xs,
            "ids": ids,
            "labels": labels,
            "paddings": paddings,
        }


class FeatPhoneCollate(PhoneCharCollate):
    """Features + phone targets (CIF_FC, reference: collates.py:115-126)."""

    def __init__(self, tokenizer_phone, quantize_shapes=True):
        self.tokenizer_phone = tokenizer_phone
        self.quantize_shapes = quantize_shapes

    def __call__(self, batch: List[dict]) -> Dict:
        feats, feat_lengths = load_feat_batch(
            [d["feat"] for d in batch], self.quantize_shapes
        )
        xs, len_xs = self.phones_of(batch)
        return {
            "uttids": [d["uttid"] for d in batch],
            "feats": feats,
            "feat_lengths": feat_lengths,
            "phones": xs,
            "phone_lengths": len_xs,
        }


class FeatPhoneCharCollate(PhoneCharCollate):
    """Features + phones + char targets (CIF_MIX,
    reference: collates.py:129-148)."""

    def __call__(self, batch: List[dict]) -> Dict:
        feats, feat_lengths = load_feat_batch(
            [d["feat"] for d in batch], self.quantize_shapes
        )
        xs, len_xs = self.phones_of(batch)
        ids, labels, paddings = self.chars_of(batch)
        return {
            "uttids": [d["uttid"] for d in batch],
            "feats": feats,
            "feat_lengths": feat_lengths,
            "phones": xs,
            "phone_lengths": len_xs,
            "ids": ids,
            "labels": labels,
            "paddings": paddings,
        }


class TokenCollate:
    """Unpaired token lines -> padded id batches
    (reference: collates.py:166-176)."""

    def __init__(self, tokenizer, add_eos=False, quantize_shapes=True):
        self.tokenizer = tokenizer
        self.add_eos = add_eos
        self.quantize_shapes = quantize_shapes

    def __call__(self, batch: List[str]) -> Dict:
        toks = [np.asarray(self.tokenizer.encode(t), np.int32) for t in batch]
        lens = np.asarray([len(t) for t in toks], np.int32)
        tmax = quantize(int(lens.max()), self.quantize_shapes)
        return {
            "tokens": pad_list(toks, EOS_ID, tmax),
            "token_lengths": lens,
        }


class TextCollate:
    """Text lines -> causal LM targets (reference: collates.py:23-34)."""

    def __init__(self, tokenizer, maxlen=None, quantize_shapes=True):
        self.tokenizer = tokenizer
        self.maxlen = maxlen
        self.quantize_shapes = quantize_shapes

    def __call__(self, batch: List[str]) -> Dict:
        rawids = [self.tokenizer.encode(t) for t in batch]
        if self.maxlen:
            rawids = [r[: self.maxlen] for r in rawids]
        umax = quantize(max(len(r) for r in rawids) + 2, self.quantize_shapes)
        ids, labels, paddings = gen_causal_targets(rawids, True, max_len=umax)
        return {"ids": ids, "labels": labels, "paddings": paddings}
