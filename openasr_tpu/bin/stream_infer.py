"""Streaming decoding CLI: chunk-incremental recognition with partials.

No reference counterpart (src/infer.py is batch-only) — this drives the
streaming executor (openasr_tpu/streaming.py) over a test manifest the
way a live service would: audio arrives in fixed chunks, greedy-CTC
partial hypotheses are emitted per chunk, and (optionally, for models
with an attention decoder) a final beam pass rescores the accumulated
encoder states — the two-pass U2-style recipe.  Reports per-chunk
device latency, the number every streaming deployment actually cares
about.

The model must be trained with ``encoder.streaming`` (see
ops/masks.py:chunk_bias); decoding a non-streaming checkpoint fails
loudly rather than silently approximating.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

from openasr_tpu.config import Config, load_config
from openasr_tpu.data.collate import FeatureCollate, WaveCollate, quantize
from openasr_tpu.data.loader import DataLoader
from openasr_tpu.data.manifest import ArkDataset, SpeechDataset
from openasr_tpu.data.sampler import CountBatchSampler
from openasr_tpu.data.tokenizer import CharTokenizer
from openasr_tpu.models import get_model_class
from openasr_tpu.utils.checkpoint import load_package


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Streaming (chunk-incremental) decoding"
    )
    parser.add_argument("--model_type", required=True)
    parser.add_argument("--model_pkg", required=True)
    parser.add_argument("--vocab_path", required=True)
    parser.add_argument("--json_file", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="parallel streams per device step")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--label_type", type=str, default="tokens")
    parser.add_argument("--offline", action="store_true", default=False,
                        help="json manifests carry precomputed features "
                             "(streamed 4*chunk frames at a time)")
    parser.add_argument("--add_blk", action="store_true", default=False)
    parser.add_argument("--split_token", action="store_true", default=False)
    parser.add_argument("--show_partials", action="store_true", default=False,
                        help="log partial hypotheses after every chunk")
    parser.add_argument("--partial_beam", type=int, default=0,
                        help="N>0: full prefix-beam partials — the "
                             "on-device beam state carries across "
                             "chunks (exactly the one-shot prefix beam "
                             "over all frames so far); 0 = greedy")
    parser.add_argument("--lm_pkg", type=str, default=None,
                        help="LM package for shallow fusion in the "
                             "streaming prefix beam (needs "
                             "--partial_beam N): the LM cache carries "
                             "across chunks like the rest of the beam "
                             "state")
    parser.add_argument("--lm_weight", type=float, default=0.0)
    parser.add_argument("--context_file", default=None,
                        help="hotword biasing in the streaming prefix "
                             "beam (needs --partial_beam N): one phrase "
                             "per line, Aho-Corasick matched, counters "
                             "carry across chunks")
    parser.add_argument("--context_weight", type=float, default=2.0)
    parser.add_argument("--rescore", action="store_true", default=False,
                        help="final attention beam pass over the "
                             "accumulated encoder states (two-pass "
                             "streaming; needs a decoder-bearing model)")
    parser.add_argument("--nbest", type=int, default=5,
                        help="beam size for --rescore")
    parser.add_argument("--maxlen", type=int, default=80)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"))
    return parser.parse_args(argv)


def main(argv=None):
    from openasr_tpu.utils import configure_compile_cache, pin_default_device

    pin_default_device()
    configure_compile_cache()
    logging.basicConfig(level=logging.INFO)
    args = get_args(argv)

    tokenizer = CharTokenizer(args.vocab_path, add_blk=args.add_blk)
    pkg = load_package(args.model_pkg)
    model_pkg = pkg["model"] if "model" in pkg else pkg

    configs = Config(model_pkg["configs"])
    if args.config:
        override = load_config(args.config)
        configs.override(override.get("model", override))
    configs.decoder["vocab_size"] = tokenizer.unit_num()
    if configs.signal and "spec_aug" in configs.signal:
        del configs.signal["spec_aug"]

    import jax.numpy as jnp

    from openasr_tpu.streaming import StreamingRecognizer

    compute_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    model = get_model_class(args.model_type).create_model(
        configs, dtype=compute_dtype
    )
    model.restore(model_pkg)
    rec = StreamingRecognizer(model)
    if args.rescore and not hasattr(model, "beam_decode_encoded"):
        raise SystemExit(
            f"--rescore needs an attention decoder; {args.model_type} has none"
        )
    if rec._head_name is None and not args.rescore:
        raise SystemExit(
            f"{args.model_type} has no CTC head for streaming partials; "
            "pass --rescore to decode with the final attention pass"
        )
    unit = rec.chunk_feats if rec.offline else rec.chunk_samples
    logging.info(
        "streaming: chunk=%d encoder frames (%d %s/step), left_chunks=%d",
        rec.chunk, unit, "feature frames" if rec.offline else "samples",
        rec.left,
    )

    if args.offline:
        test_set = ArkDataset(args.json_file, feat_range=(1, 10**9),
                              label_range=(0, 10**9), rate_in_out=(0, 10**9))
        collate = FeatureCollate(tokenizer, False, label_type=args.label_type)
    else:
        test_set = SpeechDataset(args.json_file, feat_range=(1, 10**9),
                                 label_range=(0, 10**9), rate_in_out=(0, 10**9))
        collate = WaveCollate(
            tokenizer, False, label_type=args.label_type,
            expected_rate=(configs.signal or {}).get("sample_rate", 16000),
        )
    sampler = CountBatchSampler(len(test_set), args.batch_size, shuffle=False)
    loader = DataLoader(test_set, sampler, collate, num_workers=2)

    out_path = args.output.strip()
    if out_path == "-":
        fd = sys.stdout
    else:
        import os

        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        fd = open(out_path, "w", encoding="utf8")

    # LM fusion / hotword biasing ride the streaming prefix beam only —
    # the greedy and rescore paths have no carryable fusion state, so
    # fail loudly instead of silently decoding unfused/unbiased
    lm_fusion = None
    if args.lm_pkg and args.lm_weight != 0.0:
        if args.partial_beam <= 0:
            raise SystemExit(
                "--lm_pkg shallow fusion in streaming decoding needs "
                "--partial_beam N > 0 (the beam carries the LM cache "
                "across chunks; greedy partials have no fusion hook)"
            )
        from openasr_tpu.models.lm import make_lm_step_spec

        lm_pkg = load_package(args.lm_pkg)
        lm_model_pkg = lm_pkg["model"] if "model" in lm_pkg else lm_pkg
        lm_type = lm_model_pkg.get("model_type") or "lstm_lm"
        lm = get_model_class(lm_type).create_model(
            Config(lm_model_pkg["configs"])
        )
        lm.restore(lm_model_pkg)
        lm_fusion = dict(make_lm_step_spec(lm), weight=args.lm_weight)
        logging.info("streaming shallow fusion with %s (%s, weight %.2f)",
                     args.lm_pkg, lm_type, args.lm_weight)
    context_tables = None
    if args.context_file:
        if args.partial_beam <= 0:
            raise SystemExit(
                "--context_file hotword biasing in streaming decoding "
                "needs --partial_beam N > 0 (the beam carries the "
                "phrase-match counters across chunks)"
            )
        from openasr_tpu.data.tokenizer import load_context_phrases
        from openasr_tpu.ops.ctc_beam_device import build_context_tables

        try:
            phrases = load_context_phrases(tokenizer, args.context_file)
        except ValueError as e:
            raise SystemExit(str(e))
        context_tables = build_context_tables(
            phrases, tokenizer.unit_num()
        )
        logging.info("streaming hotword biasing: %d phrases, weight %.2f",
                     phrases.shape[0], args.context_weight)

    rescore_fn = None
    if args.rescore:
        import jax

        @jax.jit
        def rescore_fn(params, encoded, elens):
            return model.beam_decode_encoded(
                params, encoded, elens,
                beam_size=args.nbest, max_decode_len=args.maxlen,
            )

    tot_utt = 0
    chunk_times: list = []
    t0 = time.time()
    for batch in loader:
        inputs, lengths = model.batch_inputs(batch)
        inputs, lengths = np.asarray(inputs), np.asarray(lengths)
        utts = batch["uttids"]

        def on_partial(n, hyps, utts=utts):
            if args.show_partials:
                for u, h in zip(utts, hyps):
                    logging.info("partial[%d] %s: %s", n, u,
                                 tokenizer.decode(h, args.split_token))

        t_first = time.time()
        hyps, enc, enc_lens = rec.decode_waves(
            inputs, lengths, on_partial=on_partial,
            partial_beam=args.partial_beam, lm_fusion=lm_fusion,
            context_tables=context_tables,
            context_weight=args.context_weight,
        )
        # decode_waves runs ceil(padded_width / unit) device steps — the
        # collate's shape quantization can pad past max(lengths), so
        # divide by the step count actually executed
        n_chunks = -(-inputs.shape[1] // unit)
        if tot_utt > 0:  # first batch pays the jit compile; don't count it
            chunk_times.append((time.time() - t_first) / max(n_chunks, 1))

        if rescore_fn is not None:
            # decode_waves trims enc to the batch's exact max valid length
            # — pad batch and time up to quantized buckets so the jitted
            # beam pass compiles a bounded set of shapes instead of one
            # program per distinct (B, E)
            b_now, e_now = enc.shape[0], enc.shape[1]
            bb, eb = args.batch_size, quantize(e_now)
            if (b_now, e_now) != (bb, eb):
                enc = np.pad(enc, [(0, bb - b_now), (0, eb - e_now), (0, 0)])
                # pad rows decode one garbage step each (length 1, not 0:
                # an all-masked memory would be degenerate) and are sliced
                # off below
                enc_lens = np.pad(enc_lens, (0, bb - b_now),
                                  constant_values=1)
            preds, lens_dec, _ = rescore_fn(model.params, enc, enc_lens)
            preds, lens_dec = np.asarray(preds), np.asarray(lens_dec)
            final = [list(preds[i][0][: int(lens_dec[i][0])])
                     for i in range(len(utts))]
        else:
            final = hyps
        for u, h in zip(utts, final):
            fd.write(f"{u} {tokenizer.decode(list(h), args.split_token)}\n")
        tot_utt += len(utts)

    dt = time.time() - t0
    if chunk_times:
        ms = 1000.0 * float(np.median(chunk_times))
        chunk_s = (rec.chunk_feats / 100.0 if rec.offline
                   else rec.chunk_samples / float(rec._fbank_cfg.sample_rate))
        logging.info(
            "median step latency %.1f ms per %.0f ms chunk "
            "(streaming RTF %.4f, host wall-clock excl. first batch; "
            "see bench.py streaming_step_ms for device-lane timing); "
            "%d utts in %.1fs",
            ms, 1000.0 * chunk_s, ms / 1000.0 / chunk_s, tot_utt, dt,
        )
    if fd is not sys.stdout:
        fd.close()


if __name__ == "__main__":
    main()
