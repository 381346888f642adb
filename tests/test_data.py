"""Data pipeline tests: audio IO, kaldi IO, manifests, samplers, collates."""

import json
import os

import numpy as np
import pytest

from openasr_tpu.data import kaldi_io
from openasr_tpu.data.audio import load_wave, read_flac, read_wav
from openasr_tpu.data.collate import (
    FeatureCollate,
    TextCollate,
    TokenCollate,
    WaveCollate,
    gen_causal_targets,
    geometric_ladder,
    quantize,
)
from openasr_tpu.data.loader import DataLoader
from openasr_tpu.data.manifest import (
    ArkDataset,
    SpeechDataset,
    TokenDataset,
    load_json_manifest,
)
from openasr_tpu.data.sampler import CountBatchSampler, FrameBasedSampler
from openasr_tpu.data.tokenizer import CharTokenizer

DATA = os.path.join(os.path.dirname(__file__), "data")


# ------------------------------------------------------------------- audio

def test_flac_decodes_bit_exact_vs_wav():
    sr_f, flac = read_flac(os.path.join(DATA, "100-121669-0000.flac"))
    sr_w, wav = read_wav(os.path.join(DATA, "100-121669-0000.wav"))
    assert sr_f == sr_w == 16000
    np.testing.assert_array_equal(flac, wav)


def test_flac_other_file():
    sr, data = read_flac(os.path.join(DATA, "103-1240-0005.flac"))
    assert sr == 16000 and len(data) > 16000
    assert np.abs(data).max() > 100  # int16 scale


def test_load_wave_schemes():
    wav_path = os.path.join(DATA, "BAC009S0764W0121.wav")
    sr1, a = load_wave("file:" + wav_path)
    sr2, b = load_wave(wav_path)
    np.testing.assert_array_equal(a, b)
    sr3, c = load_wave("flac:" + os.path.join(DATA, "100-121669-0000.flac"))
    assert sr3 == 16000
    sr4, d = load_wave("pipe:cat " + wav_path + " |")
    np.testing.assert_array_equal(a, d)


def test_wav_ark_offset(tmp_path):
    # embed a wav at an offset, like kaldi wav ark entries
    wav_path = os.path.join(DATA, "BAC009S0764W0121.wav")
    raw = open(wav_path, "rb").read()
    ark = tmp_path / "w.ark"
    with open(ark, "wb") as f:
        f.write(b"utt1 ")
        offset = f.tell()
        f.write(raw)
    sr, a = load_wave(f"ark:{ark}:{offset}")
    sr2, b = read_wav(wav_path)
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------- kaldi io

def test_ark_scp_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    mats = {f"utt{i}": rng.randn(10 + i, 13).astype(np.float32) for i in range(3)}
    prefix = str(tmp_path / "feats")
    kaldi_io.write_ark_scp(prefix, mats.items())

    got = dict(kaldi_io.read_mat_ark(prefix + ".ark"))
    assert set(got) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])

    got2 = dict(kaldi_io.read_mat_scp(prefix + ".scp"))
    for k in mats:
        np.testing.assert_array_equal(got2[k], mats[k])

    # single-mat addressing via path:offset
    with open(prefix + ".scp") as f:
        line = f.readline().strip().split(" ", 1)[1]
    np.testing.assert_array_equal(kaldi_io.read_mat(line), mats["utt0"])


def test_vec_int_ark_roundtrip(tmp_path):
    """Binary int-vector (alignment) ark: the 5-byte (int8 size, int32
    value) element layout of the Kaldi spec (ref kaldi_io.py:146-168)."""
    rng = np.random.RandomState(1)
    vecs = {f"utt{i}": rng.randint(0, 500, size=7 + i) for i in range(3)}
    path = tmp_path / "ali.ark"
    with open(path, "wb") as f:
        for k, v in vecs.items():
            kaldi_io.write_vec_int(f, v, k)
    got = dict(kaldi_io.read_vec_int_ark(str(path)))
    assert set(got) == set(vecs)
    for k in vecs:
        np.testing.assert_array_equal(got[k], vecs[k])
    # byte-level spec check of the first record
    raw = open(path, "rb").read()
    key = b"utt0 "
    assert raw.startswith(key + b"\x00B\x04")
    n0 = np.frombuffer(raw[len(key) + 3 : len(key) + 7], "<i4")[0]
    assert n0 == 7
    assert raw[len(key) + 7] == 4  # per-element int32 size marker
    # alias
    assert kaldi_io.read_ali_ark is kaldi_io.read_vec_int_ark


def test_vec_flt_ark_scp_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    vecs = {
        "a": rng.randn(11).astype(np.float32),
        "b": rng.randn(4).astype(np.float64),
    }
    ark = str(tmp_path / "vec.ark")
    scp = str(tmp_path / "vec.scp")
    with open(ark, "wb") as fa, open(scp, "w") as fs:
        for k, v in vecs.items():
            off = kaldi_io.write_vec_flt(fa, v, k)
            fs.write(f"{k} {ark}:{off}\n")
    got = dict(kaldi_io.read_vec_flt_ark(ark))
    np.testing.assert_array_equal(got["a"], vecs["a"])
    np.testing.assert_array_equal(got["b"], vecs["b"])  # DV double path
    assert got["b"].dtype == np.float64
    got2 = dict(kaldi_io.read_vec_flt_scp(scp))
    np.testing.assert_array_equal(got2["a"], vecs["a"])


def test_post_ark_roundtrip(tmp_path):
    """Posterior = vector<vector<(int32, float)>> (ref kaldi_io.py:494-554)."""
    post_a = [[(1, 0.5), (7, 0.25)], [(3, 1.0)], []]
    post_b = [[(0, 0.125)]]
    path = tmp_path / "post.ark"
    with open(path, "wb") as f:
        kaldi_io.write_post(f, post_a, "a")
        kaldi_io.write_post(f, post_b, "b")
    got = dict(kaldi_io.read_post_ark(str(path)))
    assert got["a"] == post_a
    assert got["b"] == post_b
    assert kaldi_io.read_cnet_ark is kaldi_io.read_post_ark


def test_compressed_matrix_read(tmp_path):
    # synthesize a CM2 (uint16) compressed matrix
    import struct

    rng = np.random.RandomState(1)
    mat = rng.randn(7, 5).astype(np.float32)
    mn, mx = float(mat.min()), float(mat.max())
    rngv = mx - mn
    q = np.round((mat - mn) / rngv * 65535).astype("<u2")
    path = tmp_path / "cm2.bin"
    with open(path, "wb") as f:
        f.write(b"\x00BCM2 ")
        f.write(struct.pack("<ff", mn, rngv))
        f.write(struct.pack("<ii", 7, 5))
        f.write(q.tobytes())
    got = kaldi_io.read_mat(str(path))
    np.testing.assert_allclose(got, mat, atol=rngv / 65535 + 1e-6)


# ---------------------------------------------------------------- manifest

@pytest.fixture
def manifest(tmp_path):
    samples = [
        {"uttid": f"u{i}", "feat": f"x{i}.ark:0", "feat_length": fl,
         "tokens": "a b", "token_length": 2, "trans": "ab"}
        for i, fl in enumerate([50, 10, 700, 30, 5])
    ]
    p = tmp_path / "train.json"
    p.write_text(json.dumps(samples))
    return str(p)


def test_manifest_filter_and_sort(manifest):
    ds = ArkDataset(manifest, feat_range=(8, 600), label_range=(1, 10),
                    rate_in_out=(1, 999))
    lens = [s["feat_length"] for s in ds]
    assert lens == [10, 30, 50]  # filtered 5 and 700, sorted ascending


def test_manifest_ratio_filter(manifest):
    ds = ArkDataset(manifest, feat_range=(1, 99999), label_range=(1, 10),
                    rate_in_out=(10, 999))
    lens = [s["feat_length"] for s in ds]
    assert lens == [30, 50, 700]  # ratio >= 10 excludes 5,10


def test_manifest_dir_loading(tmp_path, manifest):
    d = tmp_path / "jsons"
    d.mkdir()
    (d / "a.json").write_text(json.dumps([{ "uttid": "x", "feat": "f",
        "feat_length": 20, "tokens": "a", "token_length": 1}]))
    data = load_json_manifest(str(d), x_range=(1, 100), y_range=(1, 10),
                              rate=(1, 999))
    assert len(data) == 1


def test_flist_dataset(tmp_path):
    p = tmp_path / "waves.flist"
    p.write_text("a.flac 16000\nb.flac 8000\nc.flac 99999999\n")
    ds = SpeechDataset(str(p), feat_range=(1, 1000000))
    assert [s["feat_length"] for s in ds] == [8000, 16000]


def test_token_dataset(tmp_path):
    p = tmp_path / "tok.txt"
    p.write_text("utt1 a b c\nutt2 d e\nbadline\n")
    ds = TokenDataset(str(p), multi=2)
    assert len(ds) == 4 and ds[0] == "a b c"


# ----------------------------------------------------------------- sampler

def test_frame_based_sampler():
    data = [{"feat_length": l} for l in [10, 10, 20, 30, 40, 50]]
    s = FrameBasedSampler(data, frames=40, ngpu=2, shuffle=False)
    batches = list(s)
    for b in batches:
        assert len(b) % 2 == 0
    assert all(sum(data[i]["feat_length"] for i in b) >= 40 or True for b in batches)
    # all covered indices unique
    flat = [i for b in batches for i in b]
    assert len(flat) == len(set(flat))


def test_sampler_shuffle_permutes_batches():
    data = [{"feat_length": 10}] * 40
    s1 = FrameBasedSampler(data, frames=30, shuffle=True, seed=1)
    b1 = list(s1)
    s2 = FrameBasedSampler(data, frames=30, shuffle=False)
    b2 = list(s2)
    assert sorted(map(tuple, b1)) == sorted(map(tuple, b2))


# ----------------------------------------------------------------- collate

def test_gen_causal_targets():
    ids, labels, paddings = gen_causal_targets([[5, 6, 7], [8]], add_eos=True)
    # seq0: sos 5 6 7 eos -> ids [1,5,6,7], labels [5,6,7,2]
    np.testing.assert_array_equal(ids[0], [1, 5, 6, 7])
    np.testing.assert_array_equal(labels[0], [5, 6, 7, 2])
    np.testing.assert_array_equal(paddings[0], [0, 0, 0, 0])
    # seq1: sos 8 eos -> ids [1,8,2,2] labels [8,2,...] paddings [0,0,1,1]
    np.testing.assert_array_equal(ids[1], [1, 8, 2, 2])
    np.testing.assert_array_equal(labels[1][:2], [8, 2])
    np.testing.assert_array_equal(paddings[1], [0, 0, 1, 1])


def test_quantize_ladder():
    lad = geometric_ladder()
    assert all(b > a for a, b in zip(lad, lad[1:]))
    assert quantize(100) >= 100
    assert quantize(100) <= 128
    assert quantize(7, enable=False) == 7


def test_feature_collate_and_loader(tmp_path):
    rng = np.random.RandomState(0)
    mats = {f"utt{i}": rng.randn(20 + 7 * i, 8).astype(np.float32) for i in range(4)}
    prefix = str(tmp_path / "feats")
    kaldi_io.write_ark_scp(prefix, mats.items())
    scp = dict(
        l.strip().split(" ", 1) for l in open(prefix + ".scp")
    )
    samples = [
        {"uttid": k, "feat": v, "feat_length": mats[k].shape[0],
         "tokens": "a b c", "token_length": 3}
        for k, v in scp.items()
    ]
    p = tmp_path / "t.json"
    p.write_text(json.dumps(samples))
    vocab = tmp_path / "v.txt"
    vocab.write_text("a\nb\nc\n")
    tok = CharTokenizer(str(vocab), add_blk=True)

    ds = ArkDataset(str(p), feat_range=(1, 999), label_range=(1, 99), rate_in_out=(1, 99))
    sampler = FrameBasedSampler(ds, frames=50, shuffle=False)
    loader = DataLoader(ds, sampler, FeatureCollate(tok, add_eos=True), num_workers=2)
    batches = list(loader)
    assert len(batches) == len(sampler)
    b = batches[0]
    assert b["feats"].ndim == 3 and b["feats"].shape[2] == 8
    assert b["feats"].shape[0] == len(b["uttids"])
    assert b["ids"].shape == b["labels"].shape == b["paddings"].shape
    # feats zero-padded beyond lengths
    for i, l in enumerate(b["feat_lengths"]):
        assert np.all(b["feats"][i, l:] == 0)


def test_text_and_token_collates(tmp_path):
    vocab = tmp_path / "v.txt"
    vocab.write_text("a\nb\nc\n")
    tok = CharTokenizer(str(vocab))
    tc = TextCollate(tok)
    out = tc(["a b", "c"])
    assert out["ids"].shape == out["labels"].shape
    kc = TokenCollate(tok)
    out2 = kc(["a b c", "a"])
    assert out2["tokens"].shape[0] == 2
    np.testing.assert_array_equal(out2["token_lengths"], [3, 1])


def test_write_wav_roundtrip(tmp_path):
    """PCM16 writer parity with the readers (ref wavfile.write:284):
    scipy and our own reader both reproduce the samples."""
    from openasr_tpu.data.audio import read_wav, write_wav

    rng = np.random.RandomState(0)
    mono = (rng.randn(1600) * 3000).astype(np.float32)
    path = str(tmp_path / "m.wav")
    write_wav(path, 16000, mono)
    rate, got = read_wav(path)
    assert rate == 16000
    np.testing.assert_array_equal(got, np.rint(mono).astype(np.int16))

    from scipy.io import wavfile as scipy_wav

    s_rate, s_data = scipy_wav.read(path)
    assert s_rate == 16000
    np.testing.assert_array_equal(s_data, np.rint(mono).astype(np.int16))

    # stereo
    stereo = (rng.randn(800, 2) * 3000).astype(np.float32)
    path2 = str(tmp_path / "s.wav")
    write_wav(path2, 8000, stereo)
    s_rate2, s_data2 = scipy_wav.read(path2)
    assert s_rate2 == 8000 and s_data2.shape == (800, 2)


def test_read_mat_fast_path_and_fd_cache(tmp_path):
    """The one-read FM header fast path, the writable=False no-copy mode,
    and the thread-local ark FD cache must all reproduce the plain
    reader bit-for-bit across repeated and interleaved offset reads."""
    import threading

    from openasr_tpu.data import kaldi_io

    rng = np.random.RandomState(7)
    path = str(tmp_path / "cache.ark")
    mats, offsets = [], []
    with open(path, "wb") as f:
        for i in range(8):
            m = rng.randn(5 + i, 3).astype(np.float32)
            offsets.append(kaldi_io.write_mat(f, m, f"u{i}"))
            mats.append(m)

    # repeated + out-of-order reads through the cached-FD path
    for i in [3, 0, 7, 3, 1]:
        got = kaldi_io.read_mat(f"{path}:{offsets[i]}")
        np.testing.assert_array_equal(got, mats[i])
        ro = kaldi_io.read_mat(f"{path}:{offsets[i]}", writable=False)
        np.testing.assert_array_equal(ro, mats[i])
    assert not kaldi_io.read_mat(
        f"{path}:{offsets[0]}", writable=False
    ).flags.writeable

    # each thread gets its own FD: interleaved seeks cannot race
    errs = []

    def reader():
        try:
            for i in range(8):
                np.testing.assert_array_equal(
                    kaldi_io.read_mat(f"{path}:{offsets[i]}"), mats[i]
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
