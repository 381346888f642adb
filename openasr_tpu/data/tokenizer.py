"""Tokenizers with the reference vocabulary layout.

Vocabulary contract (reference: src/dataload/data_utils.py:21-64):
  id 0 = <unk>, id 1 = <sos>, id 2 = <eos>, then one unit per vocab-file line
  (first whitespace-separated field), and — when ``add_blk`` — a trailing
  <blk> as the LAST id.  CTC blank is therefore always ``vocab_size - 1``
  (reference: src/loss.py:9).
"""

from __future__ import annotations

from typing import Iterable, List

IGNORE_ID = -1

UNK_SYM = "<unk>"
SOS_SYM = "<sos>"
EOS_SYM = "<eos>"
BLK_SYM = "<blk>"
UNK_ID = 0
SOS_ID = 1
EOS_ID = 2

SPECIAL_SYM_SET = {
    SOS_SYM,
    EOS_SYM,
    UNK_SYM,
    BLK_SYM,
    "[VOCALIZED-NOISE]",
    "[NOISE]",
    "[LAUGHTER]",
}


class CharTokenizer:
    """Whitespace-split character/unit tokenizer."""

    def __init__(self, vocab_path: str, add_blk: bool = False):
        units = [UNK_SYM, SOS_SYM, EOS_SYM]
        with open(vocab_path, "r", encoding="utf-8") as f:
            for line in f:
                fields = line.strip().split()
                if fields:
                    units.append(fields[0])
        if add_blk:
            units.append(BLK_SYM)
        self.id2unit: List[str] = units
        self.unit2id = {u: i for i, u in enumerate(units)}
        self.add_blk = add_blk

    def to_id(self, unit: str) -> int:
        return self.unit2id[unit]

    def to_unit(self, idx: int) -> str:
        return self.id2unit[idx]

    def encode(self, textline: str) -> List[int]:
        unk = self.unit2id[UNK_SYM]
        return [self.unit2id.get(tok, unk) for tok in textline.strip().split()]

    def decode(
        self,
        ids: Iterable[int],
        split_token: bool = True,
        remove_special_sym: bool = True,
    ) -> str:
        syms = [self.id2unit[int(i)] for i in ids]
        if remove_special_sym:
            syms = [s for s in syms if s not in SPECIAL_SYM_SET]
        return (" " if split_token else "").join(syms)

    def unit_num(self) -> int:
        return len(self.id2unit)

    def __len__(self) -> int:
        return len(self.id2unit)

    @property
    def blank_id(self) -> int:
        """CTC blank = last id (requires add_blk)."""
        return len(self.id2unit) - 1


class SubwordTokenizer(CharTokenizer):
    """BPE subword tokenizer: decode rejoins '@@ ' continuations
    (reference: src/dataload/data_utils.py:67-86; the reference's decode had
    a broken ``.replace('@@ ')`` — fixed here)."""

    def decode(
        self,
        ids: Iterable[int],
        split_token: bool = True,
        remove_special_sym: bool = True,
    ) -> str:
        syms = [self.id2unit[int(i)] for i in ids]
        if remove_special_sym:
            syms = [s for s in syms if s not in SPECIAL_SYM_SET]
        if split_token:
            return " ".join(syms).replace("@@ ", "")
        # unsplit form: the continuation markers must still be removed
        # ('hel@@' + 'lo' -> 'hello', not 'hel@@lo')
        return "".join(syms).replace("@@", "")


def build_tokenizer(vocab_path: str, add_blk: bool = False, kind: str = "char"):
    if kind == "char":
        return CharTokenizer(vocab_path, add_blk=add_blk)
    if kind in ("subword", "bpe"):
        return SubwordTokenizer(vocab_path, add_blk=add_blk)
    raise ValueError(f"Unknown tokenizer kind: {kind}")


def load_context_phrases(tokenizer, path: str):
    """Hotword/context phrases for biased decoding: one phrase per line
    (tokenized like transcripts), returned as an int32 [P, L] table
    padded with -1 — the layout ops/ctc_beam_device.py consumes.

    A phrase containing any out-of-vocabulary token is REJECTED loudly:
    silently encoding it as <unk> would make the decoder boost
    <unk>-token paths while the intended hotword can never complete
    (and for AOT exports would bake the broken table in permanently)."""
    import numpy as np

    unk = tokenizer.unit2id[UNK_SYM]
    phrases = []
    with open(path, encoding="utf-8") as f:
        for lineno, line in enumerate(f, 1):
            if not line.strip():
                continue
            ids = tokenizer.encode(line)
            if not ids:
                continue
            if unk in ids:
                bad = [
                    tok for tok in line.strip().split()
                    if tokenizer.unit2id.get(tok, unk) == unk
                ]
                raise ValueError(
                    f"{path}:{lineno}: phrase {line.strip()!r} contains "
                    f"out-of-vocabulary token(s) {bad} — it would boost "
                    f"<unk> paths and never match; fix the phrase or "
                    f"the vocabulary"
                )
            phrases.append(ids)
    if not phrases:
        raise ValueError(f"{path}: no usable context phrases")
    max_l = max(len(p) for p in phrases)
    table = np.full((len(phrases), max_l), -1, np.int32)
    for i, p in enumerate(phrases):
        table[i, : len(p)] = p
    return table
