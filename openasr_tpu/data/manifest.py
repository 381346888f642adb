"""Manifest datasets: length-sorted, range/ratio-filtered sample lists.

Capability parity with the reference's dataset classes
(reference: src/dataload/datasets.py:6-175).  Json manifests carry fields
`uttid / feat / feat_length / tokens / token_length / [phones /
phone_length] / trans` (reference: tools/gen_json.py:57-79); a `json_path`
may also be a directory of *.json files.  The reference's SpeechDataset
sort bug (sorting the module instead of the sample list,
datasets.py:32) is fixed here.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional, Tuple

logger = logging.getLogger(__name__)


def load_json_manifest(
    json_path: str,
    x: str = "feat_length",
    y: str = "token_length",
    x_range: Tuple[int, int] = (1, 9999),
    y_range: Tuple[int, int] = (1, 999),
    rate: Tuple[float, float] = (1, 99),
) -> List[dict]:
    """Load sample dicts from a json file or a directory of json files,
    filtering on input length, label length, and in/out ratio (inclusive
    bounds, reference: src/dataload/datasets.py:64-100)."""
    if os.path.isdir(json_path):
        data: List[dict] = []
        for d, dirs, files in os.walk(json_path):
            # deterministic traversal: os.walk yields subdirs in
            # filesystem order, which can differ between hosts — and the
            # multi-host loader requires every host to build the
            # IDENTICAL sample order (stable length-sort preserves ties)
            dirs.sort()
            for fn in sorted(files):
                if fn.endswith(".json"):
                    with open(os.path.join(d, fn)) as f:
                        data.extend(json.load(f))
    else:
        with open(json_path) as f:
            data = json.load(f)

    kept = []
    for sample in data:
        len_x = float(sample[x])
        len_y = float(sample.get(y, 1))
        if not (x_range[0] <= len_x <= x_range[1]):
            continue
        if y in sample and not (y_range[0] <= len_y <= y_range[1]):
            continue
        if y in sample and not (rate[0] <= len_x / max(len_y, 1e-9) <= rate[1]):
            continue
        kept.append(sample)
    logger.info(
        "manifest %s: kept %d/%d samples", json_path, len(kept), len(data)
    )
    return kept


def load_flist(flist_path: str, x_range=(1, 9999)) -> List[dict]:
    """`path<TAB>num_samples` lists (CPC pretraining data,
    reference: src/dataload/datasets.py:43-62, tools/gen_wav_flist.py)."""
    data = []
    with open(flist_path) as f:
        for i, line in enumerate(f):
            fields = line.strip().split()
            if len(fields) < 2:
                continue
            length = int(fields[1])
            if x_range[0] <= length <= x_range[1]:
                data.append(
                    {"uttid": str(i), "feat": fields[0], "feat_length": length}
                )
    return data


class Dataset:
    """List-backed dataset of sample dicts."""

    data: List[dict]

    def __getitem__(self, index: int) -> dict:
        return self.data[index]

    def __len__(self) -> int:
        return len(self.data)


class SpeechDataset(Dataset):
    """Online (wave) dataset from .json or .flist manifests, sorted by
    feat_length (reference: src/dataload/datasets.py:19-41)."""

    sort_key = "feat_length"

    def __init__(
        self,
        data_file: str,
        reverse: bool = False,
        feat_range=(1, 99999),
        label_range=(1, 100),
        rate_in_out=(4, 99999),
    ):
        if data_file.endswith(".flist"):
            data = load_flist(data_file, x_range=feat_range)
        else:
            data = load_json_manifest(
                data_file,
                x_range=feat_range,
                y_range=label_range,
                rate=rate_in_out,
            )
        self.data = sorted(data, key=lambda s: float(s[self.sort_key]))
        if reverse:
            self.data.reverse()


class ArkDataset(SpeechDataset):
    """Offline (precomputed Kaldi feature) dataset
    (reference: src/dataload/datasets.py:103-111)."""

    def __init__(
        self,
        json_path: str,
        reverse: bool = False,
        feat_range=(1, 99999),
        label_range=(1, 100),
        rate_in_out=(4, 999),
    ):
        data = load_json_manifest(
            json_path, x_range=feat_range, y_range=label_range, rate=rate_in_out
        )
        self.data = sorted(data, key=lambda s: float(s["feat_length"]))
        if reverse:
            self.data.reverse()


class PhoneCharDataset(Dataset):
    """phone->char translation pairs, sorted by phone_length, optionally
    replicated `multi` times (reference: src/dataload/datasets.py:114-125)."""

    def __init__(
        self,
        json_path: str,
        sort: bool = True,
        reverse: bool = False,
        multi: int = 1,
        feat_range=(1, 99999),
        label_range=(1, 100),
        rate_in_out=(2, 999),
    ):
        data = load_json_manifest(
            json_path,
            x="phone_length",
            x_range=feat_range,
            y_range=label_range,
            rate=rate_in_out,
        )
        if sort:
            data = sorted(data, key=lambda s: float(s["phone_length"]))
            if reverse:
                data.reverse()
        if multi > 1:
            data = data * multi
        self.data = data


def load_token_lines(token_file: str) -> List[str]:
    """`uttid tok tok ...` lines -> token strings
    (reference: src/dataload/datasets.py:134-147)."""
    out = []
    with open(token_file) as f:
        for line in f:
            fields = line.strip().split(maxsplit=1)
            if len(fields) == 2:
                out.append(fields[1])
    return out


class TokenDataset(Dataset):
    """Unpaired token-line dataset (GAN unpaired phones/text,
    reference: src/dataload/datasets.py:128-147)."""

    def __init__(self, token_path: str, multi: int = 1):
        data = load_token_lines(token_path)
        if multi > 1:
            data = data * multi
        self.data = data


class TextLineByLineDataset(Dataset):
    """Plain text lines (LM training, reference: src/dataload/datasets.py:6-16)."""

    def __init__(self, fn: str):
        with open(fn) as f:
            self.data = f.read().strip().split("\n")


class SemiPhoneCharDataset(PhoneCharDataset):
    """Paired json + unpaired phone/text lines for semi-supervised GAN
    training (reference: src/dataload/datasets.py:150-175)."""

    def __init__(
        self,
        phone_path: str,
        text_path: str,
        json_path: str,
        feat_range=(1, 99999),
        label_range=(1, 100),
        rate_in_out=(2, 999),
    ):
        data = load_json_manifest(
            json_path,
            x="phone_length",
            x_range=feat_range,
            y_range=label_range,
            rate=rate_in_out,
        )
        self.data = sorted(data, key=lambda s: float(s["phone_length"]))
        self.phone_data = load_token_lines(phone_path)
        self.text_data = load_token_lines(text_path)

    def sizes(self) -> dict:
        return {
            "paired": len(self.data),
            "phone": len(self.phone_data),
            "text": len(self.text_data),
        }
