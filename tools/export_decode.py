#!/usr/bin/env python3
"""Export a trained model's beam decode as an AOT serving artifact.

  python tools/export_decode.py --model_type conv-ctc-transformer \\
      --model_pkg exp/.../avg10.pkg --vocab_path data/chars.txt \\
      --out decode.aot --buckets 8x512,16x1024 --nbest 5 --maxlen 60

The artifact contains StableHLO for each (batch, frames) bucket and for
each platform (tpu + cpu by default); serve it with
`openasr_tpu.serving.ExportedDecoder` — no model code, no retracing.

`--streaming` exports the streaming executor's tick instead (the
latency-critical serving path; requires a model trained with
`encoder.streaming`): one program per `--stream_batches` size, served
with `openasr_tpu.serving.ExportedStreamer`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openasr_tpu.config import Config
from openasr_tpu.data.tokenizer import CharTokenizer
from openasr_tpu.models import get_model_class
from openasr_tpu.serving import export_beam_decode
from openasr_tpu.utils import configure_compile_cache, pin_default_device
from openasr_tpu.utils.checkpoint import load_package


def main(argv=None):
    pin_default_device()
    configure_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", required=True)
    p.add_argument("--model_pkg", required=True)
    p.add_argument("--vocab_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--buckets", default="8x512,16x1024",
                   help="comma list of BATCHxFRAMES")
    p.add_argument("--nbest", type=int, default=5)
    p.add_argument("--maxlen", type=int, default=60)
    p.add_argument("--add_blk", action="store_true", default=False)
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--int8", action="store_true", default=False,
                   help="weight-only int8 artifact: 4x less parameter "
                        "HBM/transfer; pair with "
                        "ExportedDecoder.prepare_params")
    p.add_argument("--compute_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="compute dtype baked into the exported program; "
                        "bfloat16 doubles MXU throughput on the decode "
                        "matmuls (beam scoring stays float32)")
    p.add_argument("--ctc_device_beam", action="store_true", default=False,
                   help="CTC models: export the on-device prefix beam "
                        "(kind 'ctc_beam' — n-best entirely on device) "
                        "instead of greedy + log-probs for host rescore")
    p.add_argument("--context_file", default=None,
                   help="with --ctc_device_beam: bake hotword biasing "
                        "into the exported program (one phrase per "
                        "line, tokenized like transcripts)")
    p.add_argument("--context_weight", type=float, default=2.0)
    p.add_argument("--streaming", action="store_true", default=False,
                   help="export the streaming tick (ExportedStreamer) "
                        "instead of batch beam decode")
    p.add_argument("--stream_batches", default="1,8",
                   help="comma list of stream batch sizes (--streaming)")
    p.add_argument("--max_frames", type=int, default=5000,
                   help="positional-encoding capacity for --streaming / "
                        "token-buffer capacity for --stream_beam")
    p.add_argument("--lm_pkg", default=None,
                   help="LM package baked into the artifact for shallow "
                        "fusion (attention beam, --ctc_device_beam, and "
                        "--stream_beam kinds); LM weights stay a program "
                        "INPUT — pass them to the loader per checkpoint")
    p.add_argument("--lm_weight", type=float, default=0.0)
    p.add_argument("--cutoff_top_n", type=int, default=40,
                   help="device-beam frame-candidate top-n, baked + "
                        "recorded in meta")
    p.add_argument("--cutoff_logp", type=float, default=-20.0,
                   help="device-beam frame-candidate log-prob floor, "
                        "baked + recorded in meta")
    p.add_argument("--stream_beam", type=int, default=0,
                   help="N>0: export the streaming prefix-beam tick "
                        "(ExportedStreamBeam, width N) using the "
                        "model's streaming chunk geometry and vocab — "
                        "composes with --lm_pkg/--context_file")
    p.add_argument("--stream_beam_batch", type=int, default=8,
                   help="stream batch size for --stream_beam")
    args = p.parse_args(argv)

    tokenizer = CharTokenizer(args.vocab_path, add_blk=args.add_blk)
    pkg = load_package(args.model_pkg)
    model_pkg = pkg["model"] if "model" in pkg else pkg
    configs = Config(model_pkg["configs"])
    configs.decoder["vocab_size"] = tokenizer.unit_num()
    if configs.signal and "spec_aug" in configs.signal:
        del configs.signal["spec_aug"]
    import jax.numpy as jnp

    compute_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        args.compute_dtype
    ]
    model = get_model_class(args.model_type).create_model(
        configs, dtype=compute_dtype
    )
    model.restore(model_pkg)

    lm = None
    if args.lm_pkg and args.lm_weight != 0.0:
        lm_pkg = load_package(args.lm_pkg)
        lm_model_pkg = lm_pkg["model"] if "model" in lm_pkg else lm_pkg
        lm_type = lm_model_pkg.get("model_type") or "lstm_lm"
        lm = get_model_class(lm_type).create_model(
            Config(lm_model_pkg["configs"])
        )
        lm.restore(lm_model_pkg)

    ctx_phrases = None
    if args.context_file:
        is_ctc = not hasattr(model, "batch_beam_decode")
        if is_ctc and not (args.ctc_device_beam or args.stream_beam > 0):
            raise SystemExit(
                "--context_file biasing for CTC models requires "
                "--ctc_device_beam or --stream_beam N (the kind 'ctc' "
                "greedy export has no biasing hook)"
            )
        from openasr_tpu.data.tokenizer import load_context_phrases

        try:
            ctx_phrases = load_context_phrases(tokenizer,
                                               args.context_file)
        except ValueError as e:
            raise SystemExit(str(e))

    if args.stream_beam > 0:
        from openasr_tpu.serving import export_stream_beam
        from openasr_tpu.streaming import StreamingRecognizer

        # the chunk geometry comes from the model's own streaming
        # config, so the tick consumes exactly what the streaming-step
        # artifact emits per tick
        rec = StreamingRecognizer(model, use_jit=False)
        export_stream_beam(
            args.out, batch=args.stream_beam_batch,
            beam=args.stream_beam, chunk=rec.chunk,
            max_frames=args.max_frames,
            vocab_size=tokenizer.unit_num(),
            blank=tokenizer.unit_num() - 1,
            platforms=tuple(args.platforms.split(",")),
            cutoff_top_n=args.cutoff_top_n,
            cutoff_logp=args.cutoff_logp,
            lm=lm, lm_weight=args.lm_weight,
            context_phrases=ctx_phrases,
            context_weight=args.context_weight,
        )
        print(
            f"exported streaming prefix-beam tick (batch="
            f"{args.stream_beam_batch}, beam={args.stream_beam}, "
            f"chunk={rec.chunk}) -> {args.out}"
        )
        return

    if args.streaming:
        from openasr_tpu.serving import export_streaming_step

        sizes = [int(x) for x in args.stream_batches.split(",")]
        export_streaming_step(
            model, batch_sizes=sizes, path=args.out,
            platforms=tuple(args.platforms.split(",")),
            max_frames=args.max_frames,
        )
        print(f"exported streaming step for batches {sizes} -> {args.out}")
        return

    buckets = [
        tuple(int(x) for x in spec.split("x"))
        for spec in args.buckets.split(",")
    ]
    export_beam_decode(
        model, buckets=buckets, path=args.out, beam_size=args.nbest,
        max_decode_len=args.maxlen,
        platforms=tuple(args.platforms.split(",")),
        weights="int8" if args.int8 else "float32",
        compute=args.compute_dtype,
        ctc_device_beam=args.ctc_device_beam,
        context_phrases=ctx_phrases,
        context_weight=args.context_weight,
        cutoff_top_n=args.cutoff_top_n,
        cutoff_logp=args.cutoff_logp,
        lm=lm, lm_weight=args.lm_weight,
    )
    print(f"exported {len(buckets)} buckets -> {args.out}")


if __name__ == "__main__":
    main()
