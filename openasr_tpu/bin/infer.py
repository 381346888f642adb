"""Batch beam-search decoding CLI.

Capability parity with reference: src/infer.py:29-174 — same flags, model
reconstruction from the packaged configs (with optional --config override),
n-best logging and `utt hyp` output lines.  Decoding itself is the jitted
KV-cached beam search; CTC models use greedy/prefix-beam decoding over
device-computed log-probs (the reference needed the external `ctcdecode`
C++ package; here the prefix beam decoder is in-repo, native/ctc_decoder).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

import jax

from openasr_tpu.config import Config, load_config
from openasr_tpu.data.collate import FeatureCollate, WaveCollate
from openasr_tpu.data.loader import DataLoader
from openasr_tpu.data.manifest import ArkDataset, SpeechDataset
from openasr_tpu.data.sampler import FrameBasedSampler, TimeBasedSampler
from openasr_tpu.data.tokenizer import CharTokenizer
from openasr_tpu.models import get_model_class
from openasr_tpu.utils.checkpoint import load_package


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Decode with a trained model")
    parser.add_argument("--model_type", required=True)
    parser.add_argument("--model_pkg", required=True)
    parser.add_argument("--vocab_path", required=True)
    parser.add_argument("--json_file", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--batch_frames", type=int, default=2000)
    parser.add_argument("--nbest", type=int, default=5)
    parser.add_argument("--maxlen", type=int, default=80)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--label_type", type=str, default="tokens")
    parser.add_argument("--offline", action="store_true", default=False,
                        help="json manifests carry precomputed features")
    parser.add_argument("--add_blk", action="store_true", default=False)
    parser.add_argument("--split_token", action="store_true", default=False)
    parser.add_argument("--context_file", default=None,
                        help="hotword biasing (Aho-Corasick): a text "
                             "file with one phrase per line (tokenized "
                             "like transcripts); tokens that advance a "
                             "phrase match get boosted by "
                             "--context_weight, broken matches roll "
                             "back to the failure-link state.  Runs in "
                             "the device CTC beam (--ctc_beam_device) "
                             "and in the attention/CIF beam")
    parser.add_argument("--context_weight", type=float, default=2.0)
    parser.add_argument("--ctc_beam_device", action="store_true",
                        default=False,
                        help="run the CTC prefix beam ON the accelerator "
                             "(jitted batched search) instead of the host "
                             "C++/NumPy decoder")
    parser.add_argument("--ctc_beam", type=int, default=0,
                        help="use CTC prefix beam search with this width "
                             "(conv-ctc only; 0 = greedy)")
    parser.add_argument("--cutoff_top_n", type=int, default=40,
                        help="CTC beam frame-candidate cutoff: keep the "
                             "top-n symbols per frame (blank always kept)")
    parser.add_argument("--cutoff_logp", type=float, default=-20.0,
                        help="CTC beam frame-candidate log-prob floor")
    parser.add_argument("--lm_pkg", type=str, default=None,
                        help="LSTM LM package for shallow fusion")
    parser.add_argument("--lm_weight", type=float, default=0.0)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="compute dtype for the model forward; bfloat16 "
                             "doubles MXU throughput on the decode matmuls "
                             "(params stay float32, beam scoring stays "
                             "float32 over the logits)")
    return parser.parse_args(argv)


def main(argv=None):
    from openasr_tpu.utils import (
        configure_compile_cache,
        pin_default_device,
    )
    pin_default_device()
    configure_compile_cache()
    logging.basicConfig(level=logging.INFO)
    args = get_args(argv)
    t_start = time.time()

    is_ctc_type = args.model_type.lower().replace("-", "_") in (
        "conv_ctc", "gru_ctc", "wav2vec_ctc"
    )
    if args.ctc_beam_device and not (is_ctc_type and args.ctc_beam > 0):
        # fail loudly before any loading — silently greedy-decoding
        # would have the user benchmark/score the wrong decoder
        raise SystemExit(
            "--ctc_beam_device needs a CTC model type AND --ctc_beam N "
            "> 0 (it selects the on-device prefix beam; without "
            "--ctc_beam the run would silently fall back to greedy)"
        )
    if args.context_file and is_ctc_type and not args.ctc_beam_device:
        # the host CTC decoders (greedy / C++ prefix beam) have no
        # biasing hook; attention/CIF models bias in the jitted beam
        raise SystemExit(
            "--context_file hotword biasing for CTC models runs in the "
            "on-device prefix beam: add --ctc_beam N --ctc_beam_device"
        )

    tokenizer = CharTokenizer(args.vocab_path, add_blk=args.add_blk)
    pkg = load_package(args.model_pkg)
    model_pkg = pkg["model"] if "model" in pkg else pkg

    configs = Config(model_pkg["configs"])
    if args.config:
        override = load_config(args.config)
        configs.override(override.get("model", override))
    configs.decoder["vocab_size"] = tokenizer.unit_num()
    # decoding is deterministic: drop SpecAug
    if configs.signal and "spec_aug" in configs.signal:
        del configs.signal["spec_aug"]

    import jax.numpy as jnp

    model_cls = get_model_class(args.model_type)
    compute_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        args.dtype
    ]
    model = model_cls.create_model(configs, dtype=compute_dtype)
    model.restore(model_pkg)

    if args.offline:
        test_set = ArkDataset(args.json_file, feat_range=(1, 10**9),
                              label_range=(0, 10**9), rate_in_out=(0, 10**9))
        collate = FeatureCollate(tokenizer, False, label_type=args.label_type)
        sampler = FrameBasedSampler(test_set, args.batch_frames, 1)
    else:
        test_set = SpeechDataset(args.json_file, feat_range=(1, 10**9),
                                 label_range=(0, 10**9), rate_in_out=(0, 10**9))
        collate = WaveCollate(
            tokenizer, False, label_type=args.label_type,
            expected_rate=(configs.signal or {}).get("sample_rate", 16000)
            if (configs.signal or {}).get("feature_type") == "fbank"
            else None,
        )
        sampler = TimeBasedSampler(test_set, args.batch_frames, 1)
    loader = DataLoader(test_set, sampler, collate, num_workers=2)

    out_path = args.output.strip()
    if out_path == "-":
        fd = sys.stdout
    else:
        # recipes write into exp_dir/decode_*/hyp.txt; create the directory
        # rather than crash after the (expensive) model load
        import os

        parent = os.path.dirname(os.path.abspath(out_path))
        os.makedirs(parent, exist_ok=True)
        fd = open(out_path, "w", encoding="utf8")

    # same '-'/'_'/case normalization as the model registry, so every
    # accepted spelling ('gru-ctc', 'wav2vec-ctc', ...) routes correctly
    is_ctc = args.model_type.lower().replace("-", "_") in (
        "conv_ctc", "gru_ctc", "wav2vec_ctc"
    )

    # hotword table: loaded once, compiled once into the AC automaton
    # (shared by the device CTC beam and the attention/CIF beam)
    ctx_tables = None
    if args.context_file:
        from openasr_tpu.data.tokenizer import load_context_phrases
        from openasr_tpu.ops.ctc_beam_device import build_context_tables

        try:
            pad = load_context_phrases(tokenizer, args.context_file)
        except ValueError as e:
            raise SystemExit(str(e))
        ctx_tables = build_context_tables(pad, tokenizer.unit_num())
        logging.info(
            "hotword biasing: %d phrases, weight %.2f",
            pad.shape[0], args.context_weight,
        )

    lm = None
    if args.lm_pkg and args.lm_weight != 0.0:
        if is_ctc and not (args.ctc_beam > 0 and args.ctc_beam_device):
            # the host CTC paths (greedy / C++ prefix beam) have no
            # fusion hook — fail loudly instead of logging fusion and
            # silently not applying it.  The DEVICE prefix beam fuses
            # (ops/ctc_beam_device.py).
            raise SystemExit(
                "--lm_pkg shallow fusion with a CTC model needs the "
                "on-device prefix beam: add --ctc_beam N "
                "--ctc_beam_device (the host CTC decoders have no "
                "fusion hook)"
            )
        lm_pkg = load_package(args.lm_pkg)
        lm_model_pkg = lm_pkg["model"] if "model" in lm_pkg else lm_pkg
        # the package records its own type: lstm_lm OR transformer_lm
        # (make_lm_fusion dispatches the step/cache machinery)
        lm_type = lm_model_pkg.get("model_type") or "lstm_lm"
        lm = get_model_class(lm_type).create_model(
            Config(lm_model_pkg["configs"])
        )
        lm.restore(lm_model_pkg)
        logging.info("Shallow fusion with %s (%s, weight %.2f)",
                     args.lm_pkg, lm_type, args.lm_weight)
    ctc_decoder = None
    ctc_beam_device_fn = None
    if is_ctc and args.ctc_beam > 0:
        if args.ctc_beam_device:
            # whole-batch prefix beam ON the accelerator: no [B, T, V]
            # log-prob transfer to host, no per-utterance loop
            # (ops/ctc_beam_device.py, oracle-parity tested)
            from functools import partial

            from openasr_tpu.ops.ctc_beam_device import (
                ctc_prefix_beam_device,
            )

            ctx_kw = {}
            if ctx_tables is not None:
                ctx_kw = {"context_tables": ctx_tables,
                          "context_weight": args.context_weight}

            ctc_beam_device_fn = partial(
                ctc_prefix_beam_device,
                blank=tokenizer.unit_num() - 1, beam=args.ctc_beam,
                cutoff_top_n=args.cutoff_top_n,
                cutoff_logp=args.cutoff_logp,
                **ctx_kw,
            )
            if lm is not None:
                from openasr_tpu.models.lm import make_lm_step_spec

                # ONE step closure for every batch (it is a static jit
                # arg — a fresh closure per batch would retrace), and it
                # closes over the MODULE only: the weights ride as a
                # traced jit argument, one shared device copy instead of
                # constants baked into every shape-bucket executable
                # (same rule as the attention beam_fn below)
                lm_spec = make_lm_step_spec(lm)

                def ctc_beam_device_fn(log_probs, len_logits,
                                       _beam=args.ctc_beam,
                                       _w=args.lm_weight):
                    bb = int(log_probs.shape[0]) * _beam
                    # ≤ one LM token per encoder frame, + the <sos>
                    init_cache = lm_spec["init_cache_fn"](
                        bb, int(log_probs.shape[1]) + 1
                    )
                    return ctc_prefix_beam_device(
                        log_probs, len_logits,
                        blank=tokenizer.unit_num() - 1, beam=_beam,
                        cutoff_top_n=args.cutoff_top_n,
                        cutoff_logp=args.cutoff_logp,
                        lm_step_fn=lm_spec["step_fn"],
                        init_lm_cache=init_cache,
                        lm_weight=_w, lm_params=lm_spec["params"],
                        **ctx_kw,
                    )
        else:
            from openasr_tpu.ops.prefix_beam import make_decoder

            ctc_decoder = make_decoder(
                beam_width=args.ctc_beam,
                blank_id=tokenizer.unit_num() - 1,
                cutoff_top_n=args.cutoff_top_n,
                cutoff_logp=args.cutoff_logp,
            )

    # Decode functions are jit-wrapped ONCE; jax.jit then caches one
    # executable per (quantized) input-shape bucket — the collate's
    # geometric shape ladder keeps the bucket count small, so every batch
    # after the first of its bucket runs the compiled program with no
    # retrace (the reference's hot loop: src/Speech_Models.py:158).
    if is_ctc:
        @jax.jit
        def logits_fn(params, inputs, lengths):
            logits, len_logits = model.get_logits(params, inputs, lengths)
            return (
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                len_logits,
            )

        @jax.jit
        def greedy_fn(params, inputs, lengths):
            return model.greedy_decode(params, inputs, lengths)
    else:
        # lm params ride as a jit ARGUMENT (like model.params) so they are
        # one shared device copy instead of constants baked into every
        # shape-bucket executable
        lm_host_params = lm.params if lm is not None else None

        @jax.jit
        def beam_fn(params, lm_params, inputs, lengths):
            return model.batch_beam_decode(
                params, inputs, lengths,
                beam_size=args.nbest, max_decode_len=args.maxlen,
                lm=lm, lm_params=lm_params, lm_weight=args.lm_weight,
                context_tables=ctx_tables,
                context_weight=args.context_weight,
            )

    seen_buckets = set()
    tot_utt = 0
    tot_audio_frames = 0
    for batch in loader:
        inputs, lengths = model.batch_inputs(batch)
        utts = batch["uttids"]
        bucket = tuple(np.shape(inputs))
        t_batch = time.time()
        if is_ctc:
            if ctc_beam_device_fn is not None:
                log_probs, len_logits = logits_fn(model.params, inputs, lengths)
                toks, tlens, sc = ctc_beam_device_fn(log_probs, len_logits)
                toks, tlens, sc = (
                    np.asarray(toks), np.asarray(tlens), np.asarray(sc)
                )
                # drop never-populated sentinel rows (score ~-1e30:
                # fewer live prefixes than the beam width) — the host
                # decoders never emit such hypotheses
                live = sc > -1e29
                preds = [toks[i][live[i]] for i in range(len(utts))]
                lens = [tlens[i][live[i]] for i in range(len(utts))]
                scores = [sc[i][live[i]] for i in range(len(utts))]
            elif ctc_decoder is not None:
                log_probs, len_logits = logits_fn(model.params, inputs, lengths)
                log_probs = np.asarray(log_probs)
                nbest = ctc_decoder.decode_batch(
                    log_probs, np.asarray(len_logits)
                )
                preds = [[h.tokens for h in n] for n in nbest]
                lens = [[len(h.tokens) for h in n] for n in nbest]
                scores = [[h.score for h in n] for n in nbest]
            else:
                ids, idlens = greedy_fn(model.params, inputs, lengths)
                ids, idlens = np.asarray(ids), np.asarray(idlens)
                preds = [[ids[i]] for i in range(len(utts))]
                lens = [[int(idlens[i])] for i in range(len(utts))]
                scores = [[0.0] for _ in range(len(utts))]
        else:
            pred_ids, len_dec, sc = beam_fn(
                model.params, lm_host_params, inputs, lengths
            )
            pred_ids = np.asarray(pred_ids)
            len_dec = np.asarray(len_dec)
            sc = np.asarray(sc)
            preds = [pred_ids[i] for i in range(len(utts))]
            lens = [len_dec[i] for i in range(len(utts))]
            scores = [sc[i] for i in range(len(utts))]
        dt_batch = time.time() - t_batch
        if bucket not in seen_buckets:
            seen_buckets.add(bucket)
            logging.info(
                "decode bucket %s: first batch %.2fs (includes compile)",
                bucket, dt_batch,
            )
        else:
            logging.debug("decode bucket %s: %.3fs", bucket, dt_batch)

        for i, utt in enumerate(utts):
            msg = f"Results for {utt}:\n"
            for j, (pred, ln, score) in enumerate(
                zip(preds[i], lens[i], scores[i])
            ):
                hyp = tokenizer.decode(
                    list(np.asarray(pred)[: int(ln)]),
                    split_token=args.split_token,
                )
                msg += f"top{j + 1}: {hyp} score: {float(score):.10f}\n"
                if j == 0:
                    fd.write(f"{utt} {hyp}\n")
            logging.info("\n%s", msg)
        tot_utt += len(utts)
        tot_audio_frames += int(np.sum(lengths))

    dt = time.time() - t_start
    logging.info(
        "Decoded %d utterances in %.2f min (%.2f s/utt)",
        tot_utt, dt / 60.0, dt / max(tot_utt, 1),
    )
    if fd is not sys.stdout:
        fd.close()


if __name__ == "__main__":
    main()
