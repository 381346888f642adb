"""AOT export of the decode path for serving (TPU-native deployment).

`jax.export` serializes the jitted, KV-cached beam search — StableHLO plus
calling convention — so a serving process can run decoding without any
model-building Python (and with zero retracing): load the artifact, feed
(params, feats, lens). Artifacts are exported per shape bucket (the same
quantized ladder the data pipeline emits) and for multiple platforms, so
one artifact serves TPU and CPU hosts.

This is capability beyond the reference (its serving story was "run
infer.py"); it is the natural deployment form for an XLA program.

Artifact layout: a single zip file (no pickle — loading an artifact must
never execute code, serving artifacts travel between machines):
  meta.json                  -- {"model_type", "beam_size", ...,
                                 "buckets": [[B, T], ...]}
  exports/{B}x{T}.stablehlo  -- raw jax.export serialized bytes per bucket
"""

from __future__ import annotations

import json
import zipfile
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_beam_decode(
    model,
    buckets: Sequence[Tuple[int, int]],
    path: str,
    beam_size: int = 5,
    max_decode_len: int = 60,
    platforms: Sequence[str] = ("tpu", "cpu"),
    weights: str = "float32",
    compute: str = "float32",
    ctc_device_beam: bool = False,
    context_phrases=None,
    context_weight: float = 0.0,
    cutoff_top_n: int = 40,
    cutoff_logp: float = -20.0,
    lm=None,
    lm_weight: float = 0.0,
) -> None:
    """Export the model's decode path for each (batch, frames) bucket.

    Attention/CIF models export the KV-cached beam search
    (`batch_beam_decode` -> preds/lens/scores); pure-CTC models export
    greedy decode plus log-probs (`kind: "ctc"` -> ids/lens and
    log_probs/len_logits for a host-side prefix-beam rescore), or — with
    `ctc_device_beam=True` — the jitted on-device prefix beam
    (ops/ctc_beam_device.py; `kind: "ctc_beam"` -> n-best
    tokens/lens/scores like the attention kind, no host decode at all).

    Params stay an INPUT of the exported function (weight-independent
    artifact: push new checkpoints without re-exporting).

    weights="int8": the exported program takes weight-only-quantized
    params (quant.quantize_params) and dequantizes on device — 4x less
    parameter HBM/transfer for the weight-bound decode path; max
    per-weight error is half a quantization step (see quant.py).
    Callers quantize each checkpoint once (ExportedDecoder.prepare_params
    does it from the meta).

    `compute` is informational: the model's compute dtype is baked into
    its module at build time (create_model(dtype=...)); pass the same
    string here so the artifact's meta records what was exported.

    `lm`/`lm_weight`: shallow fusion baked into the artifact for BOTH
    beam kinds (kind 'beam' attention search and kind 'ctc_beam' device
    prefix beam — matching infer.py's live capability).  The LM MODULE
    is baked; its WEIGHTS ride as a second program input (the same
    weight-independence rule as the model params), so
    `ExportedDecoder.__call__` takes (params, feats, lens,
    lm_params=...).  LM params always stay float32 (int8 applies to
    the model weights only).  `cutoff_top_n`/`cutoff_logp` are the
    device beam's frame-candidate pruning knobs, recorded in meta like
    the other decode settings."""
    from openasr_tpu import quant

    input_dim = int(model.configs.encoder["input_dim"])
    is_ctc = not hasattr(model, "batch_beam_decode")
    if weights not in ("float32", "int8"):
        raise ValueError(f"weights must be float32 or int8, got {weights!r}")
    int8 = weights == "int8"
    use_lm = lm is not None and lm_weight != 0.0
    if use_lm and is_ctc and not ctc_device_beam:
        raise ValueError(
            "LM fusion in a CTC export needs ctc_device_beam=True "
            "(the kind 'ctc' greedy+log-probs artifact has no fusion "
            "hook — same rule as infer.py)"
        )
    lm_spec = None
    if use_lm:
        from openasr_tpu.models.lm import make_lm_step_spec

        lm_spec = make_lm_step_spec(lm)

    def prep(params):
        return quant.dequantize_params(params) if int8 else params

    if is_ctc and ctc_device_beam:
        from openasr_tpu.ops.ctc_beam_device import (
            build_context_tables,
            ctc_prefix_beam_device,
        )

        vocab = int(model.configs.decoder["vocab_size"])
        # a deployment's hotword table is fixed per export: bake it into
        # the program (unlike params, which stay an input)
        ctx_kw = {}
        if context_phrases is not None and context_weight != 0.0:
            ctx_kw = {
                "context_tables": build_context_tables(
                    np.asarray(context_phrases), vocab
                ),
                "context_weight": float(context_weight),
            }

        def decode(qparams, lm_params, feats, lens):
            params = prep(qparams)
            logits, len_logits = model.get_logits(params, feats, lens)
            log_probs = jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1
            )
            lm_kw = {}
            if use_lm:
                bb = int(log_probs.shape[0]) * beam_size
                lm_kw = {
                    "lm_step_fn": lm_spec["step_fn"],
                    # ≤ one LM token per encoder frame, + the <sos>;
                    # the init cache is zeros — weight-independent
                    "init_lm_cache": lm_spec["init_cache_fn"](
                        bb, int(log_probs.shape[1]) + 1
                    ),
                    "lm_weight": float(lm_weight),
                    "lm_params": lm_params,
                }
            return ctc_prefix_beam_device(
                log_probs, len_logits, blank=vocab - 1, beam=beam_size,
                cutoff_top_n=int(cutoff_top_n),
                cutoff_logp=float(cutoff_logp),
                **lm_kw, **ctx_kw,
            )
    elif is_ctc:
        def decode(qparams, lm_params, feats, lens):
            params = prep(qparams)
            ids, id_lens = model.greedy_decode(params, feats, lens)
            logits, len_logits = model.get_logits(params, feats, lens)
            log_probs = jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1
            )
            return ids, id_lens, log_probs, len_logits
    else:
        attn_ctx_kw = {}
        if context_phrases is not None and context_weight != 0.0:
            from openasr_tpu.ops.ctc_beam_device import (
                build_context_tables,
            )

            attn_ctx_kw = {
                "context_tables": build_context_tables(
                    np.asarray(context_phrases),
                    int(model.configs.decoder["vocab_size"]),
                ),
                "context_weight": float(context_weight),
            }

        def decode(qparams, lm_params, feats, lens):
            return model.batch_beam_decode(
                prep(qparams), feats, lens, beam_size=beam_size,
                max_decode_len=max_decode_len,
                lm=lm if use_lm else None,
                lm_params=lm_params if use_lm else None,
                lm_weight=float(lm_weight) if use_lm else 0.0,
                **attn_ctx_kw,
            )

    export_params = (
        quant.quantize_params(model.params) if int8 else model.params
    )
    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        export_params,
    )
    exports = {}
    for b, t in buckets:
        feats_spec = jax.ShapeDtypeStruct((b, t, input_dim), jnp.float32)
        lens_spec = jax.ShapeDtypeStruct((b,), jnp.int32)
        if use_lm:
            # LM weights ride as a SECOND program input — the artifact
            # stays weight-independent for the LM too
            lm_params_spec = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    np.shape(x), np.asarray(x).dtype
                ),
                lm_spec["params"],
            )
            exp = jax_export.export(
                jax.jit(decode), platforms=tuple(platforms)
            )(params_spec, lm_params_spec, feats_spec, lens_spec)
        else:
            # LM-less artifacts keep the 3-input calling convention
            # (byte-compatible with pre-fusion exports)
            exp = jax_export.export(
                jax.jit(lambda p, f, l: decode(p, (), f, l)),
                platforms=tuple(platforms),
            )(params_spec, feats_spec, lens_spec)
        exports[(int(b), int(t))] = exp.serialize()

    meta = {
        "model_type": getattr(model, "model_type", ""),
        "kind": (
            ("ctc_beam" if ctc_device_beam else "ctc")
            if is_ctc else "beam"
        ),
        "beam_size": int(beam_size),
        "max_decode_len": int(max_decode_len),
        "input_dim": input_dim,
        "platforms": list(platforms),
        "buckets": [[int(b), int(t)] for b, t in buckets],
        "weights": weights,
        "compute": compute,
        # the device beam's frame-candidate pruning is baked into the
        # program — record it so a tuned deployment is reproducible
        # from the artifact alone
        "cutoff_top_n": int(cutoff_top_n),
        "cutoff_logp": float(cutoff_logp),
        # derived from the SAME condition that bakes the table into the
        # program — meta must never claim biasing the program lacks
        "context_weight": (
            float(context_weight)
            if context_phrases is not None and context_weight != 0.0
            else 0.0
        ),
        "context_num_phrases": (
            int(np.shape(context_phrases)[0])
            if context_phrases is not None and context_weight != 0.0
            else 0
        ),
        # derived from the SAME condition that bakes fusion in: meta
        # never claims an LM the program lacks (and vice versa)
        "lm": (
            {"model_type": getattr(lm, "model_type", ""),
             "lm_weight": float(lm_weight)}
            if use_lm else None
        ),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        for (b, t), data in exports.items():
            zf.writestr(f"exports/{b}x{t}.stablehlo", data)


class ExportedDecoder:
    """Serving-side loader: picks the fitting bucket with the least padded
    compute, zero-pads the batch into it, runs the AOT program, trims the
    result rows."""

    def __init__(self, path: str):
        with zipfile.ZipFile(path, "r") as zf:
            self.meta = json.loads(zf.read("meta.json"))
            self._fns = {}
            for b, t in self.meta["buckets"]:
                data = zf.read(f"exports/{b}x{t}.stablehlo")
                self._fns[(int(b), int(t))] = jax_export.deserialize(data)
        self.buckets = sorted(self._fns)

    def prepare_params(self, params):
        """Convert a checkpoint's param tree to the artifact's weight
        format (int8-quantize when the export asked for it; identity
        otherwise).  Do this ONCE per checkpoint, not per call."""
        if self.meta.get("weights") == "int8":
            from openasr_tpu import quant

            return quant.quantize_params(params)
        return params

    def _pick(self, b: int, t: int) -> Tuple[int, int]:
        # minimal padded area, not first-in-sorted-order: with buckets
        # [(8, 4096), (16, 128)] a (8, 100) request must run the (16, 128)
        # program, not pad 100 frames out to 4096
        fitting = [
            (bb * bt, bb, bt)
            for bb, bt in self.buckets
            if bb >= b and bt >= t
        ]
        if not fitting:
            raise ValueError(
                f"no exported bucket fits batch={b} frames={t}; "
                f"available: {self.buckets}"
            )
        _, bb, bt = min(fitting)
        return bb, bt

    def __call__(self, params, feats, lens, lm_params=None):
        """feats [B, T, D] float32, lens [B] int32.

        kind 'beam' -> (preds [B, beam, U], lens [B, beam],
        scores [B, beam]); kind 'ctc' -> (ids [B, T'], id_lens [B],
        log_probs [B, T', V], len_logits [B]); kind 'ctc_beam' ->
        (tokens [B, beam, T'], lens [B, beam], scores [B, beam]) —
        the on-device prefix beam's n-best, no host decode.

        Artifacts exported with an LM (meta['lm'] non-null) take the LM
        checkpoint's params as `lm_params` (always float32 — int8
        applies to the model weights only); both mismatches fail
        loudly."""
        feats = np.asarray(feats, np.float32)
        lens = np.asarray(lens, np.int32)
        b, t, d = feats.shape
        assert d == self.meta["input_dim"], (d, self.meta["input_dim"])
        if self.meta.get("lm") and lm_params is None:
            raise ValueError(
                f"this artifact was exported with "
                f"{self.meta['lm']['model_type']} shallow fusion "
                f"(weight {self.meta['lm']['lm_weight']}): pass the LM "
                f"checkpoint's params as lm_params"
            )
        if not self.meta.get("lm") and lm_params is not None:
            raise ValueError(
                "this artifact was exported WITHOUT LM fusion; "
                "lm_params would be silently ignored — re-export with "
                "lm= to fuse"
            )
        bb, bt = self._pick(b, t)
        padded = np.zeros((bb, bt, d), np.float32)
        padded[:b, :t] = feats
        plens = np.ones((bb,), np.int32)  # pad rows decode 1 dummy frame
        plens[:b] = lens
        if self.meta.get("lm"):
            out = self._fns[(bb, bt)].call(params, lm_params, padded, plens)
        else:
            out = self._fns[(bb, bt)].call(params, padded, plens)
        return tuple(np.asarray(o)[:b] for o in out)


# ------------------------------------------------- streaming step export

def _tree_spec_meta(tree):
    """Serializable {path: {shape, dtype}} of a (nested-dict) pytree —
    enough to rebuild a zeroed state host-side with no model code."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
        else:
            arr = np.asarray(node)
            flat[prefix] = {"shape": list(arr.shape),
                            "dtype": str(arr.dtype)}

    walk(tree, "")
    return flat


def _tree_from_spec_meta(flat):
    out: dict = {}
    for path, spec in flat.items():
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.zeros(spec["shape"], np.dtype(spec["dtype"]))
    return out


def export_streaming_step(
    model,
    batch_sizes: Sequence[int],
    path: str,
    platforms: Sequence[str] = ("tpu", "cpu"),
    max_frames: int = 5000,
) -> None:
    """AOT-export the streaming executor's jitted tick (streaming.py
    `_step_impl`) — the latency-critical serving path — one program per
    stream batch size.

    The artifact records the state pytree's shapes/dtypes per batch size,
    so a serving process rebuilds the zero state and drives the loop
    with no model code: load, init_state(b), feed chunks.  Params stay
    an input (weight-independent artifact, like export_beam_decode).
    Exactness carries over: the exported program IS the executor's
    step, which is exact against the batch forward (tests/test_streaming
    .py); the round-trip test pins exported == live per tick."""
    from openasr_tpu.streaming import StreamingRecognizer

    rec = StreamingRecognizer(model, use_jit=False, max_frames=max_frames)
    params = model.params
    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        params,
    )

    exports = {}
    state_meta = {}
    for b in batch_sizes:
        b = int(b)
        state = rec.init_state(b)
        state_spec = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            state,
        )
        if rec.offline:
            chunk_shape = (b, 4 * rec.chunk, rec.feat_dim)
        else:
            chunk_shape = (b, rec.chunk_samples)
        exp = jax_export.export(
            jax.jit(rec._step_impl), platforms=tuple(platforms)
        )(
            params_spec,
            state_spec,
            jax.ShapeDtypeStruct(chunk_shape, jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        )
        exports[b] = exp.serialize()
        state_meta[str(b)] = _tree_spec_meta(
            jax.tree_util.tree_map(np.asarray, state)
        )

    meta = {
        "kind": "streaming_step",
        "model_type": getattr(model, "model_type", ""),
        "chunk": rec.chunk,
        "phase": int(rec.phase),
        "left_chunks": rec.left,
        "offline": bool(rec.offline),
        "feat_dim": int(rec.feat_dim),
        "chunk_input": (
            [4 * rec.chunk, rec.feat_dim] if rec.offline
            else [rec.chunk_samples]
        ),
        "max_frames": int(max_frames),
        "platforms": list(platforms),
        "batch_sizes": [int(b) for b in batch_sizes],
        "state": state_meta,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        for b, data in exports.items():
            zf.writestr(f"exports/b{b}.stablehlo", data)


def export_stream_beam(
    path: str,
    batch: int,
    beam: int,
    chunk: int,
    max_frames: int,
    vocab_size: int,
    blank: int,
    platforms: Sequence[str] = ("tpu", "cpu"),
    cutoff_top_n: int = 40,
    cutoff_logp: float = -20.0,
    lm=None,
    lm_weight: float = 0.0,
    context_phrases=None,
    context_weight: float = 0.0,
    sos_id: int = 1,
) -> None:
    """AOT-export the streaming CTC prefix-beam tick
    (ops/ctc_beam_device.ctc_beam_stream_step) — so streaming SERVING
    gets full prefix-beam partials with LM fusion and hotword biasing,
    not just the live python path (round-4 directive #3).

    Two programs ride in the artifact:
      init: [lm_params] -> state         (the seeded beam state — the
            <sos> LM step makes it weight-dependent, so it is a
            PROGRAM, keeping the artifact weight-independent)
      tick: (state, log_probs [B, chunk, V], frame_valid [B, chunk]
            [, lm_params]) -> (new_state, (toks, lens, scores))

    Feed it the per-tick log-softmax over the logits an
    `export_streaming_step` artifact emits.  Hotword tables and decode
    knobs are baked (recorded in meta); LM weights ride as an input.
    Serve with `ExportedStreamBeam`."""
    from openasr_tpu.ops.ctc_beam_device import (
        build_context_tables,
        ctc_beam_stream_init,
        ctc_beam_stream_step,
    )

    use_lm = lm is not None and lm_weight != 0.0
    use_ctx = context_phrases is not None and context_weight != 0.0
    lm_spec = None
    if use_lm:
        from openasr_tpu.models.lm import make_lm_step_spec

        lm_spec = make_lm_step_spec(lm)
    tables = (
        build_context_tables(np.asarray(context_phrases), int(vocab_size))
        if use_ctx else None
    )

    def init_fn(lm_params):
        kw = {}
        if use_lm:
            kw = {
                "lm_step_fn": lm_spec["step_fn"],
                "init_lm_cache": lm_spec["init_cache_fn"](
                    batch * beam, max_frames + 1
                ),
                "lm_params": lm_params,
                "sos_id": int(sos_id),
            }
        return ctc_beam_stream_init(
            int(batch), int(beam), int(max_frames),
            num_phrases=int(tables["plen"].shape[0]) if use_ctx else 0,
            **kw,
        )

    def tick_fn(state, log_probs, frame_valid, lm_params):
        kw = {}
        if use_lm:
            kw = {
                "lm_step_fn": lm_spec["step_fn"],
                "lm_weight": float(lm_weight),
                "lm_params": lm_params,
            }
        if use_ctx:
            kw.update(context_tables=tables,
                      context_weight=float(context_weight))
        return ctc_beam_stream_step(
            state, log_probs, frame_valid, blank=int(blank),
            beam=int(beam), cutoff_top_n=int(cutoff_top_n),
            cutoff_logp=float(cutoff_logp), **kw,
        )

    def spec_of(x):
        return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)

    if use_lm:
        lm_params_spec = jax.tree_util.tree_map(spec_of, lm_spec["params"])
        init_exp = jax_export.export(
            jax.jit(init_fn), platforms=tuple(platforms)
        )(lm_params_spec)
        state0 = init_fn(lm_spec["params"])
        state_spec = jax.tree_util.tree_map(spec_of, state0)
        tick_exp = jax_export.export(
            jax.jit(tick_fn), platforms=tuple(platforms)
        )(
            state_spec,
            jax.ShapeDtypeStruct((batch, chunk, vocab_size), jnp.float32),
            jax.ShapeDtypeStruct((batch, chunk), jnp.bool_),
            lm_params_spec,
        )
    else:
        init_exp = jax_export.export(
            jax.jit(lambda: init_fn(None)), platforms=tuple(platforms)
        )()
        state0 = init_fn(None)
        state_spec = jax.tree_util.tree_map(spec_of, state0)
        tick_exp = jax_export.export(
            jax.jit(lambda s, lp, fv: tick_fn(s, lp, fv, None)),
            platforms=tuple(platforms),
        )(
            state_spec,
            jax.ShapeDtypeStruct((batch, chunk, vocab_size), jnp.float32),
            jax.ShapeDtypeStruct((batch, chunk), jnp.bool_),
        )

    meta = {
        "kind": "stream_beam",
        "batch": int(batch),
        "beam": int(beam),
        "chunk": int(chunk),
        "max_frames": int(max_frames),
        "vocab_size": int(vocab_size),
        "blank": int(blank),
        "cutoff_top_n": int(cutoff_top_n),
        "cutoff_logp": float(cutoff_logp),
        "platforms": list(platforms),
        # same no-lying rule as export_beam_decode's meta
        "lm": (
            {"model_type": getattr(lm, "model_type", ""),
             "lm_weight": float(lm_weight)}
            if use_lm else None
        ),
        "context_weight": float(context_weight) if use_ctx else 0.0,
        "context_num_phrases": (
            int(tables["plen"].shape[0]) if use_ctx else 0
        ),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        zf.writestr("exports/init.stablehlo", init_exp.serialize())
        zf.writestr("exports/tick.stablehlo", tick_exp.serialize())


class ExportedStreamBeam:
    """Serving-side loader for `export_stream_beam` artifacts:
    `init_state([lm_params])` runs the exported seeding program,
    `step(state, log_probs, frame_valid[, lm_params])` advances one
    tick and returns (new_state, (toks, lens, scores)) — the running
    n-best partial.  Replays the live path's loud token-buffer
    capacity guard host-side."""

    def __init__(self, path: str):
        with zipfile.ZipFile(path, "r") as zf:
            self.meta = json.loads(zf.read("meta.json"))
            if self.meta.get("kind") != "stream_beam":
                raise ValueError(
                    f"{path} is not a stream_beam artifact "
                    f"(kind={self.meta.get('kind')!r})"
                )
            self._init = jax_export.deserialize(
                zf.read("exports/init.stablehlo")
            )
            self._tick = jax_export.deserialize(
                zf.read("exports/tick.stablehlo")
            )

    def init_state(self, lm_params=None):
        if self.meta.get("lm"):
            if lm_params is None:
                raise ValueError(
                    "artifact exported with LM fusion: init_state "
                    "needs the LM checkpoint's params"
                )
            return self._init.call(lm_params)
        if lm_params is not None:
            raise ValueError("artifact exported without LM fusion")
        return self._init.call()

    def step(self, state, log_probs, frame_valid, lm_params=None):
        log_probs = np.asarray(log_probs, np.float32)
        frame_valid = np.asarray(frame_valid, bool)
        b, ch = self.meta["batch"], self.meta["chunk"]
        if log_probs.shape != (b, ch, self.meta["vocab_size"]):
            raise ValueError(
                f"log_probs shape {log_probs.shape} != exported "
                f"{(b, ch, self.meta['vocab_size'])}"
            )
        # same loud capacity bound as the live ctc_beam_stream_step
        fed = int(np.max(np.asarray(state["fed"])))
        incoming = int(frame_valid.sum(-1).max())
        if fed + incoming > self.meta["max_frames"]:
            raise ValueError(
                f"stream exceeds the exported beam token buffer "
                f"({fed} fed + {incoming} incoming > max_frames="
                f"{self.meta['max_frames']}); re-export with a larger "
                f"max_frames"
            )
        if self.meta.get("lm"):
            if lm_params is None:
                raise ValueError(
                    "artifact exported with LM fusion: step needs the "
                    "LM checkpoint's params"
                )
            return self._tick.call(state, log_probs, frame_valid,
                                   lm_params)
        return self._tick.call(state, log_probs, frame_valid)


class ExportedStreamer:
    """Serving-side streaming loop over an `export_streaming_step`
    artifact: `init_state(b)` rebuilds the zero state from recorded
    shapes, `step(params, state, chunk[, chunk_lens])` runs the AOT tick.
    The stream's batch size is fixed at init (pick a bucket ≥ your
    stream count and zero-pad rows — padded rows are ordinary silent
    streams)."""

    def __init__(self, path: str):
        with zipfile.ZipFile(path, "r") as zf:
            self.meta = json.loads(zf.read("meta.json"))
            if self.meta.get("kind") != "streaming_step":
                raise ValueError(
                    f"{path} is not a streaming-step artifact "
                    f"(kind={self.meta.get('kind')!r})"
                )
            self._fns = {
                int(b): jax_export.deserialize(
                    zf.read(f"exports/b{b}.stablehlo")
                )
                for b in self.meta["batch_sizes"]
            }
        self.batch_sizes = sorted(self._fns)
        self.chunk = int(self.meta["chunk"])

    def init_state(self, batch_size: int) -> dict:
        if batch_size not in self._fns:
            raise ValueError(
                f"no exported program for batch_size={batch_size}; "
                f"available: {self.batch_sizes} (pad your streams up to "
                f"a bucket)"
            )
        return _tree_from_spec_meta(self.meta["state"][str(batch_size)])

    def step(self, params, state, chunk, chunk_lens=None):
        chunk = np.asarray(chunk, np.float32)
        b = chunk.shape[0]
        expected = [b] + self.meta["chunk_input"]
        if list(chunk.shape) != expected:
            raise ValueError(
                f"chunk shape {list(chunk.shape)} != exported {expected}"
            )
        if b not in self._fns:
            raise ValueError(
                f"no exported program for batch_size={b}; available: "
                f"{self.batch_sizes} (pad your streams up to a bucket)"
            )
        if chunk_lens is None:
            chunk_lens = np.full((b,), chunk.shape[1], np.int32)
        # same loud PE-capacity bound as StreamingRecognizer.step
        # (streaming.py — incl. its `- phase` warm-up-slot credit) —
        # silent positional clamping on long streams would break the
        # exact-vs-batch contract
        cur = int(np.asarray(state["chunk_idx"]))
        phase = int(self.meta.get("phase", 1))
        if (cur + 1) * self.chunk - phase > int(self.meta["max_frames"]):
            raise ValueError(
                f"stream exceeds exported positional-encoding capacity "
                f"(max_frames={self.meta['max_frames']}); re-export with "
                f"a larger max_frames"
            )
        out = self._fns[b].call(
            params, state, chunk, np.asarray(chunk_lens, np.int32)
        )
        return out  # (new_state, {"enc", "valid", "logits"})
