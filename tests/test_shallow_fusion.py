"""LM shallow fusion in beam search."""

import numpy as np

import jax

from openasr_tpu.config import Config
from openasr_tpu.models import get_model_class


def test_shallow_fusion_changes_scores_and_matches_weight_zero():
    cfg = Config({
        "type": "conv-transformer",
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer", "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 20,
                    "d_model": 32, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 32, "dim_feedforward": 64,
                    "activation": "relu", "dropout_rate": 0.0},
    })
    model = get_model_class(cfg.type).create_model(cfg)
    lm_cfg = Config({"type": "lstm_lm", "vocab_size": 20, "d_model": 16,
                     "n_layers": 1, "dropout_rate": 0.0})
    lm = get_model_class("lstm_lm").create_model(lm_cfg)

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 48, 20).astype(np.float32)
    lens = np.array([48, 40], np.int32)

    base_preds, base_lens, base_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=3, max_decode_len=6,
    )
    zero_preds, _, zero_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=3, max_decode_len=6,
        lm=lm, lm_weight=0.0,
    )
    np.testing.assert_array_equal(np.asarray(base_preds), np.asarray(zero_preds))
    np.testing.assert_allclose(
        np.asarray(base_scores), np.asarray(zero_scores), rtol=1e-5
    )

    fused_preds, _, fused_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=3, max_decode_len=6,
        lm=lm, lm_weight=0.5,
    )
    assert not np.allclose(np.asarray(fused_scores), np.asarray(base_scores))

    # fused decode also works under jit
    decode = jax.jit(
        lambda p, lp, x, l: model.batch_beam_decode(
            p, x, l, beam_size=3, max_decode_len=6,
            lm=lm, lm_params=lp, lm_weight=0.5,
        )
    )
    j_preds, _, j_scores = decode(model.params, lm.params, feats, lens)
    np.testing.assert_array_equal(np.asarray(j_preds), np.asarray(fused_preds))


def test_cif_beam_decode_accepts_lm():
    """CIF-family batch_beam_decode must take the same lm kwargs the infer
    CLI always passes (a missing signature here made CLI decode of CIF
    models crash with TypeError)."""
    cfg = Config({
        "type": "CIF",
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "assigner": {"d_model": 32, "n_layers": 2, "w_context": 3,
                     "dropout": 0.0},
        "decoder": {"type": "CIF_Decoder", "vocab_size": 20, "d_model": 32,
                    "nhead": 2, "num_layers": 1, "encoder_dim": 32,
                    "dim_feedforward": 64, "activation": "relu",
                    "dropout_rate": 0.0},
    })
    model = get_model_class("CIF").create_model(cfg)
    lm = get_model_class("lstm_lm").create_model(Config(
        {"type": "lstm_lm", "vocab_size": 20, "d_model": 16,
         "n_layers": 1, "dropout_rate": 0.0}
    ))
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 48, 20).astype(np.float32)
    lens = np.array([48, 40], np.int32)

    base_preds, _, base_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6,
        lm=lm, lm_weight=0.0,
    )
    fused_preds, _, fused_scores = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6,
        lm=lm, lm_params=lm.params, lm_weight=0.5,
    )
    assert np.asarray(fused_preds).shape == np.asarray(base_preds).shape
    assert not np.allclose(np.asarray(fused_scores), np.asarray(base_scores))


# ----------------------------------------------- transformer-LM fusion

def test_transformer_lm_step_equals_batch_forward():
    """TransformerLM.step (KV-cached, O(1)/token) is exact against the
    causal batch forward — the basis of transformer-LM shallow fusion."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class

    lm = get_model_class("transformer_lm").create_model(Config({
        "vocab_size": 12, "d_model": 16, "nhead": 2, "num_layers": 2,
        "dim_feedforward": 32, "dropout_rate": 0.0,
    }))
    mod = lm.module
    ids = np.random.RandomState(0).randint(0, 12, (3, 9)).astype(np.int32)
    full = mod.apply({"params": lm.params}, jnp.asarray(ids))
    full_lp = jax.nn.log_softmax(full.astype(jnp.float32), -1)
    cache = mod.apply({"params": lm.params}, 3, 16,
                      method=type(mod).init_step_cache)
    for t in range(ids.shape[1]):
        lp, cache = mod.apply({"params": lm.params},
                              jnp.asarray(ids[:, t]), cache,
                              method=type(mod).step)
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(full_lp[:, t]), atol=2e-5,
            err_msg=f"step {t}",
        )


def test_transformer_lm_fusion_in_attention_beam():
    """make_lm_fusion dispatches on the LM type: a transformer LM fuses
    into the attention beam search and changes the scores."""
    import numpy as np

    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class

    from test_serving import small_model

    model = small_model()
    lm = get_model_class("transformer_lm").create_model(Config({
        "vocab_size": 20, "d_model": 16, "nhead": 2, "num_layers": 1,
        "dim_feedforward": 32, "dropout_rate": 0.0,
    }))
    feats = np.random.RandomState(0).randn(2, 24, 20).astype(np.float32)
    lens = np.asarray([24, 18], np.int32)
    base = model.batch_beam_decode(model.params, feats, lens,
                                   beam_size=2, max_decode_len=6)
    fused = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6,
        lm=lm, lm_params=lm.params, lm_weight=0.4,
    )
    assert np.asarray(fused[0]).shape == np.asarray(base[0]).shape
    assert not np.allclose(np.asarray(fused[2]), np.asarray(base[2]))


def test_transformer_lm_fusion_in_device_ctc_beam():
    """The device CTC prefix beam fuses a transformer LM through the
    same (lm_params, tokens, cache) convention; oracle check mirrors
    the LSTM one (tests/test_ctc_beam_device.py) at top-1."""
    import math

    import numpy as np

    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class
    from openasr_tpu.models.lm import TransformerLM, make_lm_fusion
    from openasr_tpu.ops.ctc_beam_device import ctc_prefix_beam_device

    v, blank, beam, b, t = 8, 7, 4, 2, 10
    lm = get_model_class("transformer_lm").create_model(Config({
        "vocab_size": v - 1, "d_model": 16, "nhead": 2, "num_layers": 1,
        "dim_feedforward": 32, "dropout_rate": 0.0,
    }))
    w, sos = 0.5, 1
    rng = np.random.RandomState(13)
    logits = rng.randn(b, t, v).astype(np.float32) * 2.0
    lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(
        np.float32
    )
    lengths = np.asarray([t, t - 2], np.int32)

    lm_step_fn, init_cache = make_lm_fusion(lm, lm.params, b * beam,
                                            max_len=t + 1)
    toks, lens_out, scores = ctc_prefix_beam_device(
        lp, lengths, blank=blank, beam=beam, lm_step_fn=lm_step_fn,
        init_lm_cache=init_cache, lm_weight=w, sos_id=sos,
    )
    toks, lens_out, scores = map(np.asarray, (toks, lens_out, scores))

    # python oracle: LM scores recomputed per prefix from scratch
    mod = lm.module

    def lm_logp_of(prefix):
        import jax.numpy as jnp

        cache = mod.apply({"params": lm.params}, 1, t + 1,
                          method=TransformerLM.init_step_cache)
        logp = None
        for tok in (sos,) + prefix:
            logp, cache = mod.apply(
                {"params": lm.params}, jnp.asarray([tok]), cache,
                method=TransformerLM.step,
            )
        return np.asarray(logp)[0]

    def log_add(a, b_):
        if a == -np.inf:
            return b_
        if b_ == -np.inf:
            return a
        m = max(a, b_)
        return m + math.log1p(math.exp(-abs(a - b_)))

    for i in range(b):
        beams = {(): (0.0, -np.inf)}
        lm_tbl = {(): lm_logp_of(())}
        for tt in range(int(lengths[i])):
            frame = lp[i, tt]
            new = {}

            def acc(prefix, pb=-np.inf, pnb=-np.inf):
                o = new.get(prefix, (-np.inf, -np.inf))
                new[prefix] = (log_add(o[0], pb), log_add(o[1], pnb))

            for prefix, (p_b, p_nb) in beams.items():
                p_tot = log_add(p_b, p_nb)
                lastc = prefix[-1] if prefix else -1
                for c in range(v):
                    f = float(frame[c])
                    if c == blank:
                        acc(prefix, pb=p_tot + f)
                        continue
                    bonus = w * float(lm_tbl[prefix][c])
                    if c == lastc:
                        acc(prefix, pnb=p_nb + f)
                        acc(prefix + (c,), pnb=p_b + f + bonus)
                    else:
                        acc(prefix + (c,), pnb=p_tot + f + bonus)
            beams = dict(sorted(
                new.items(), key=lambda kv: log_add(*kv[1]), reverse=True,
            )[:beam])
            for prefix in beams:
                if prefix not in lm_tbl:
                    lm_tbl[prefix] = lm_logp_of(prefix)
        ora = sorted(
            ((p, log_add(*s)) for p, s in beams.items()),
            key=lambda kv: kv[1], reverse=True,
        )
        dev_top = tuple(int(c) for c in toks[i, 0, : lens_out[i, 0]])
        assert dev_top == ora[0][0], (i, dev_top, ora[0][0])
        assert np.isclose(scores[i, 0], ora[0][1], atol=3e-3)


def test_transformer_lm_step_with_divergent_row_positions():
    """Regression (round-4 review): in the CTC prefix beam, rows reach
    step() at DIFFERENT positions (stays keep the parent cache
    un-advanced).  Each row's output must equal an independent per-row
    replay — a shared idx[0] silently corrupted divergent rows by up to
    ~1.7 nats."""
    import numpy as np

    import jax.numpy as jnp

    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class

    lm = get_model_class("transformer_lm").create_model(Config({
        "vocab_size": 12, "d_model": 16, "nhead": 2, "num_layers": 2,
        "dim_feedforward": 32, "dropout_rate": 0.0,
    }))
    mod = lm.module
    rng = np.random.RandomState(0)
    # per-row prefixes of DIFFERENT lengths
    prefixes = [(3, 5, 2), (7,), (1, 2, 3, 4), ()]
    next_tokens = np.asarray([4, 9, 6, 2], np.int32)
    b, max_len = len(prefixes), 8

    def replay(prefix, tok):
        cache = mod.apply({"params": lm.params}, 1, max_len,
                          method=type(mod).init_step_cache)
        for c in prefix + (int(tok),):
            lp, cache = mod.apply({"params": lm.params},
                                  jnp.asarray([c]), cache,
                                  method=type(mod).step)
        return np.asarray(lp)[0]

    # build a batched cache with divergent rows by feeding row tokens
    # one position at a time (rows past their prefix length feed a dummy
    # token; we then OVERWRITE those rows' state with their earlier
    # snapshot, exactly what the beam's where(is_stay, parent, adv) does)
    import jax

    cache = mod.apply({"params": lm.params}, b, max_len,
                      method=type(mod).init_step_cache)
    snapshots = {}
    max_p = max(len(p) for p in prefixes)
    for t in range(max_p):
        for bi, p in enumerate(prefixes):
            if len(p) == t:
                snapshots[bi] = jax.tree_util.tree_map(
                    lambda x: np.asarray(x[bi]), cache
                )
        toks = np.asarray(
            [p[t] if t < len(p) else 0 for p in prefixes], np.int32
        )
        _, cache = mod.apply({"params": lm.params}, jnp.asarray(toks),
                             cache, method=type(mod).step)
    for bi, p in enumerate(prefixes):
        if len(p) == max_p:
            snapshots[bi] = jax.tree_util.tree_map(
                lambda x: np.asarray(x[bi]), cache
            )
    # stitch the divergent batch cache
    cache = jax.tree_util.tree_map(
        lambda *rows: jnp.stack([jnp.asarray(r) for r in rows]),
        *[snapshots[bi] for bi in range(b)],
    )
    assert len({int(i) for i in np.asarray(cache["idx"])}) > 1

    lp, _ = mod.apply({"params": lm.params}, jnp.asarray(next_tokens),
                      cache, method=type(mod).step)
    lp = np.asarray(lp)
    for bi, p in enumerate(prefixes):
        ref = replay(p, next_tokens[bi])
        np.testing.assert_allclose(lp[bi], ref, atol=2e-5,
                                   err_msg=f"row {bi} prefix {p}")


def test_transformer_lm_step_cache_refuses_pe_overflow():
    """init_step_cache rejects max_len past the 5000-row PE table: step's
    per-row PE gather clamps there, so rows beyond would silently reuse
    PE[4999] and diverge from the batch forward (which fails loudly)."""
    import pytest

    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class

    lm = get_model_class("transformer_lm").create_model(Config({
        "vocab_size": 12, "d_model": 16, "nhead": 2, "num_layers": 1,
        "dim_feedforward": 32, "dropout_rate": 0.0,
    }))
    mod = lm.module
    with pytest.raises(ValueError, match="positional-encoding"):
        mod.apply({"params": lm.params}, 2, 5001,
                  method=type(mod).init_step_cache)
    mod.apply({"params": lm.params}, 2, 5000,
              method=type(mod).init_step_cache)  # at the bound: fine


# ------------------------------------------- attention-beam hotword biasing

def test_attention_beam_biasing_scores_match_ac_oracle():
    """Hotword biasing in the attention beam (round-4 directive #7): for
    hypotheses present in both the plain and biased n-best, the score
    difference is EXACTLY context_weight * the Aho-Corasick boost of the
    token sequence (python AC replay), and a strongly-boosted phrase
    takes over the 1-best."""
    import numpy as np

    from openasr_tpu.ops.ctc_beam_device import build_context_tables

    from test_serving import small_model

    model = small_model()
    phrases = [(5, 6), (9, 9)]
    pad = np.full((2, 2), -1, np.int32)
    for i, ph in enumerate(phrases):
        pad[i, : len(ph)] = ph
    tables = build_context_tables(pad, 20)

    rng = np.random.RandomState(3)
    feats = rng.randn(2, 24, 20).astype(np.float32)
    lens = np.asarray([24, 18], np.int32)

    base = model.batch_beam_decode(model.params, feats, lens,
                                   beam_size=3, max_decode_len=6)
    w = 0.3  # small: perturbs scores without reshuffling every beam
    biased = model.batch_beam_decode(
        model.params, feats, lens, beam_size=3, max_decode_len=6,
        context_tables=tables, context_weight=w,
    )

    def ac_boost(seq):
        total = 0.0
        for ph in phrases:
            n = len(ph)
            fail = [0] * (n + 1)
            k = 0
            for m in range(1, n):
                while k and ph[m] != ph[k]:
                    k = fail[k]
                if ph[m] == ph[k]:
                    k += 1
                fail[m + 1] = k
            m = comp = 0
            for c in seq:
                while m > 0 and ph[m] != c:
                    m = fail[m]
                m = m + 1 if ph[m] == c else 0
                if m == n:
                    comp += 1
                    m = fail[n]
            total += comp * n + m
        return total

    def nbest_map(out):
        preds, lens_d, scores = map(np.asarray, out)
        res = {}
        for b in range(preds.shape[0]):
            for k in range(preds.shape[1]):
                seq = tuple(int(c) for c in preds[b, k, : lens_d[b, k]])
                res[(b, seq)] = float(scores[b, k])
        return res

    base_map, biased_map = nbest_map(base), nbest_map(biased)
    common = set(base_map) & set(biased_map)
    assert common, "no shared hypotheses to oracle-check"
    for key in common:
        _, seq = key
        np.testing.assert_allclose(
            biased_map[key] - base_map[key], w * ac_boost(seq),
            atol=2e-4, err_msg=str(key),
        )

    # a strong boost makes the beam decode the phrase on a loop (after
    # completion the automaton restarts via the failure link and the
    # next advance earns +w again)
    strong = model.batch_beam_decode(
        model.params, feats, lens, beam_size=3, max_decode_len=6,
        context_tables=tables, context_weight=8.0,
    )
    top = [int(c) for c in np.asarray(strong[0])[0, 0]]
    assert top[:4] in ([5, 6, 5, 6], [9, 9, 9, 9]), top


def test_cif_beam_decode_accepts_biasing():
    """CIF-family batch_beam_decode takes the same context kwargs the
    infer CLI passes, and biasing changes the scores."""
    import numpy as np

    from openasr_tpu.ops.ctc_beam_device import build_context_tables

    cfg = Config({
        "type": "CIF",
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "assigner": {"d_model": 32, "n_layers": 2, "w_context": 3,
                     "dropout": 0.0},
        "decoder": {"type": "CIF_Decoder", "vocab_size": 20, "d_model": 32,
                    "nhead": 2, "num_layers": 1, "encoder_dim": 32,
                    "dim_feedforward": 64, "activation": "relu",
                    "dropout_rate": 0.0},
    })
    model = get_model_class("CIF").create_model(cfg)
    tables = build_context_tables(np.asarray([[5, 6, -1]], np.int32), 20)
    rng = np.random.RandomState(2)
    feats = rng.randn(2, 48, 20).astype(np.float32)
    lens = np.array([48, 40], np.int32)
    base = model.batch_beam_decode(model.params, feats, lens,
                                   beam_size=2, max_decode_len=6)
    biased = model.batch_beam_decode(
        model.params, feats, lens, beam_size=2, max_decode_len=6,
        context_tables=tables, context_weight=2.0,
    )
    assert np.asarray(biased[0]).shape == np.asarray(base[0]).shape
    assert not np.allclose(np.asarray(biased[2]), np.asarray(base[2]))


def test_infer_cli_attention_biasing(tmp_path):
    """infer.py --context_file on an attention model (guard removed in
    round 5): the biased CLI run completes, writes well-formed output,
    and a strong boost changes the hypotheses vs the plain run."""
    import json

    from openasr_tpu.bin.infer import main as infer_main
    from openasr_tpu.data import kaldi_io
    from openasr_tpu.utils.checkpoint import save_package

    units = ["a", "b", "c", "d"]
    (tmp_path / "vocab.txt").write_text("\n".join(units) + "\n")
    (tmp_path / "hotwords.txt").write_text("a b\n")
    rng = np.random.RandomState(5)
    mats, samples = [], []
    for i in range(2):
        t = int(rng.randint(20, 30))
        key = f"utt{i:02d}"
        mats.append((key, (rng.randn(t, 20) * 0.5).astype(np.float32)))
        samples.append({"uttid": key, "feat_length": t, "tokens": "a",
                        "token_length": 1})
    prefix = str(tmp_path / "feats")
    kaldi_io.write_ark_scp(prefix, mats)
    scp = dict(l.strip().split(" ", 1) for l in open(prefix + ".scp"))
    for s in samples:
        s["feat"] = scp[s["uttid"]]
    (tmp_path / "test.json").write_text(json.dumps(samples))

    cfg = Config({
        "type": "conv-transformer", "add_eos": True,
        "signal": {"feature_type": "offline"},
        "encoder": {"type": "Transformer",
                    "sub": {"type": "ConvV2", "layer_num": 1},
                    "input_dim": 20, "d_model": 32, "nhead": 2,
                    "dim_feedforward": 64, "activation": "relu",
                    "num_layers": 1, "dropout_rate": 0.0},
        "decoder": {"type": "TransformerDecoder", "vocab_size": 8,
                    "d_model": 32, "nhead": 2, "num_layers": 1,
                    "encoder_dim": 32, "dim_feedforward": 64,
                    "activation": "relu", "dropout_rate": 0.0},
    })
    model = get_model_class("conv-transformer").create_model(cfg)
    save_package({"model": model.package()}, str(tmp_path / "last.pkg"))

    common = [
        "--model_type", "conv-transformer",
        "--model_pkg", str(tmp_path / "last.pkg"),
        "--vocab_path", str(tmp_path / "vocab.txt"),
        "--json_file", str(tmp_path / "test.json"),
        "--batch_frames", "500",
        "--offline", "--add_blk", "--split_token",
        "--nbest", "2", "--maxlen", "6",
    ]
    plain_out = str(tmp_path / "hyp_plain.txt")
    ctx_out = str(tmp_path / "hyp_ctx.txt")
    infer_main(common + ["--output", plain_out])
    infer_main(common + [
        "--output", ctx_out,
        "--context_file", str(tmp_path / "hotwords.txt"),
        "--context_weight", "8.0",
    ])
    plain = open(plain_out).read().strip().split("\n")
    ctx = open(ctx_out).read().strip().split("\n")
    assert len(ctx) == 2
    for line in ctx:
        assert line.split(" ", 1)[0].startswith("utt")
    assert ctx != plain, "strong biasing changed nothing"
    # the boosted phrase dominates the hypotheses
    for line in ctx:
        assert "a b" in line, line
