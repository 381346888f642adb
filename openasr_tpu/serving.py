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
) -> None:
    """Export the model's decode path for each (batch, frames) bucket.

    Attention/CIF models export the KV-cached beam search
    (`batch_beam_decode` -> preds/lens/scores); pure-CTC models export
    greedy decode plus log-probs (`kind: "ctc"` -> ids/lens and
    log_probs/len_logits for a host-side prefix-beam rescore).

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
    string here so the artifact's meta records what was exported."""
    from openasr_tpu import quant

    input_dim = int(model.configs.encoder["input_dim"])
    is_ctc = not hasattr(model, "batch_beam_decode")
    if weights not in ("float32", "int8"):
        raise ValueError(f"weights must be float32 or int8, got {weights!r}")
    int8 = weights == "int8"

    def prep(params):
        return quant.dequantize_params(params) if int8 else params

    if is_ctc:
        def decode(qparams, feats, lens):
            params = prep(qparams)
            ids, id_lens = model.greedy_decode(params, feats, lens)
            logits, len_logits = model.get_logits(params, feats, lens)
            log_probs = jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1
            )
            return ids, id_lens, log_probs, len_logits
    else:
        def decode(qparams, feats, lens):
            return model.batch_beam_decode(
                prep(qparams), feats, lens, beam_size=beam_size,
                max_decode_len=max_decode_len,
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
        exp = jax_export.export(
            jax.jit(decode), platforms=tuple(platforms)
        )(
            params_spec,
            jax.ShapeDtypeStruct((b, t, input_dim), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        )
        exports[(int(b), int(t))] = exp.serialize()

    meta = {
        "model_type": getattr(model, "model_type", ""),
        "kind": "ctc" if is_ctc else "beam",
        "beam_size": int(beam_size),
        "max_decode_len": int(max_decode_len),
        "input_dim": input_dim,
        "platforms": list(platforms),
        "buckets": [[int(b), int(t)] for b, t in buckets],
        "weights": weights,
        "compute": compute,
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

    def __call__(self, params, feats, lens):
        """feats [B, T, D] float32, lens [B] int32.

        kind 'beam' -> (preds [B, beam, U], lens [B, beam],
        scores [B, beam]); kind 'ctc' -> (ids [B, T'], id_lens [B],
        log_probs [B, T', V], len_logits [B])."""
        feats = np.asarray(feats, np.float32)
        lens = np.asarray(lens, np.int32)
        b, t, d = feats.shape
        assert d == self.meta["input_dim"], (d, self.meta["input_dim"])
        bb, bt = self._pick(b, t)
        padded = np.zeros((bb, bt, d), np.float32)
        padded[:b, :t] = feats
        plens = np.ones((bb,), np.int32)  # pad rows decode 1 dummy frame
        plens[:b] = lens
        out = self._fns[(bb, bt)].call(params, padded, plens)
        return tuple(np.asarray(o)[:b] for o in out)
