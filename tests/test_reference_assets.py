"""Fixtures from the reference's committed data assets.

The reference ships its AISHELL-1 training vocabulary
(egs/aishell1/data/aishell1_train_chars.txt, copied verbatim — data, not
code) and a full decode of the AISHELL-1 test set
(egs/aishell1/exp/conv-transformer/hyp.txt -> tests/data/aishell1/
ref_conv_transformer_hyp.txt), the decode behind the README's
Conv-Transformer row (7176 sentences, reference: README.md:9-17).  The
corpus transcripts are NOT in either repo (they are AISHELL-1 data), so the
published CER 6.44/6.74 cannot be recomputed here; these tests pin what CAN
be pinned:

  * the committed vocab covers every character the reference's trained
    system emitted (vocabulary-closure: tokenizer-compatible assets);
  * CharTokenizer loads the vocab to the unit count the reference used
    (<unk>/<sos>/<eos> + 4230 chars + <blk> = 4234 with add_blk; the
    recipe yamls derive decoder.vocab_size from exactly this file);
  * tools/wer.py and tools/sclite_score.py reproduce the published
    sentence count and score the golden decode deterministically.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = os.path.join(REPO, "egs", "aishell1", "data",
                     "aishell1_train_chars.txt")
GOLDEN = os.path.join(REPO, "tests", "data", "aishell1",
                      "ref_conv_transformer_hyp.txt")


def read_vocab():
    with open(VOCAB, encoding="utf-8") as f:
        return [l.strip() for l in f if l.strip()]


def test_vocab_matches_reference_size():
    chars = read_vocab()
    assert len(chars) == 4230  # the reference's AISHELL-1 char inventory


def test_tokenizer_loads_reference_vocab():
    from openasr_tpu.data.tokenizer import CharTokenizer

    tok = CharTokenizer(VOCAB, add_blk=True)
    # <unk>/<sos>/<eos> + 4230 chars + <blk>; the recipe yamls set
    # decoder.vocab_size = tokenizer.unit_num() from this same file
    assert tok.unit_num() == 4234

    line = "祝 可 爱 的 你"
    ids = tok.encode(line)
    assert tok.decode(ids, split_token=False) == "祝可爱的你"


def test_golden_decode_closed_under_vocab():
    vocab = set(read_vocab())
    n_lines = 0
    for line in open(GOLDEN, encoding="utf-8"):
        parts = line.strip().split()
        assert parts, "empty line in golden decode"
        n_lines += 1
        for token in parts[1:]:
            for ch in token:
                assert ch in vocab, f"OOV char {ch!r} in {parts[0]}"
    # README.md Conv-Transformer row: 7176 test sentences
    assert n_lines == 7176


def test_wer_cli_scores_golden_decode(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "wer.py"),
         "--hyp", GOLDEN, "--ref", GOLDEN, "--cer"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "CER 0.00" in out
    assert "7176 snt" in out


def test_sclite_cli_scores_golden_decode(tmp_path):
    report = tmp_path / "score.txt"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "sclite_score.py"),
         "--ref", GOLDEN, "--hyp", GOLDEN, "--out", str(report), "--cer"],
        capture_output=True, text=True, check=True,
    )
    text = report.read_text()
    assert "SYSTEM SUMMARY" in text
    assert "7176" in text
