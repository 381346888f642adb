"""Config system: attribute-accessible nested dicts loaded from YAML.

Capability parity with the reference's YAML config surface
(reference: src/train.py:55-61 — which relied on a missing `utils.AttrDict`;
this is that class, done properly).  The schema is the reference's:
three top-level sections `data / training / model`, model subsections
`signal / encoder / [assigner] / decoder` (reference: src/train.py:87-118).
"""

from __future__ import annotations

import copy
from typing import Any, Iterator, Mapping

import yaml


class Config(dict):
    """A dict with attribute access, recursive wrapping, and .get defaults.

    Missing attribute access returns ``None`` (the reference configs rely on
    optional keys like ``continue_training:`` being falsy when absent).
    """

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__()
        merged: dict = {}
        for a in args:
            if a is None:
                continue
            merged.update(a)
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, Mapping):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, Config._wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError:
            return None

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __deepcopy__(self, memo: dict) -> "Config":
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        """Plain nested dict (for serialization)."""
        out: dict = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(
                    x.to_dict() if isinstance(x, Config) else x for x in v
                )
            else:
                out[k] = v
        return out

    def flat_items(self, prefix: str = "") -> Iterator[tuple]:
        for k, v in self.items():
            path = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, Config):
                yield from v.flat_items(path)
            else:
                yield path, v

    def override(self, other: Mapping | None) -> "Config":
        """Recursive update (used by infer-time config overrides,
        reference: src/infer.py:57-76)."""
        if not other:
            return self
        for k, v in other.items():
            if isinstance(v, Mapping) and isinstance(self.get(k), Config):
                self[k].override(v)
            else:
                self[k] = v
        return self


# --------------------------------------------------------------- validation
#
# The reference silently ignored unknown YAML keys (src/train.py:55-61 reads
# sections ad hoc), so a typo like `feature_size:` for `num_mel_bins:`
# trains a model with the DEFAULT value and no diagnostic.  The rebuild
# warns on keys no component consumes — with a did-you-mean hint — and
# turns missing-required-key crashes (bare KeyError deep in a solver) into
# actionable errors at load time.  Unknown keys stay warnings, never
# errors: configs may carry annotations and forward-compat knobs.

_KNOWN_KEYS: dict = {
    "": {"data", "model", "training"},
    "data": {
        "trainset", "devset", "vocab_path", "vocab_phone", "vocab_char",
        "feat_range", "label_range", "fetchworker_num", "acousticset",
        "unpaired_phone", "unpaired_text",
    },
    "training": {
        "label_type", "batch_frames", "batch_time", "batch_phones",
        "batch_size", "unpaired_batch_size", "exp_dir", "print_inteval",
        "num_epoch", "accumulate_grad_batch", "init_lr", "optimtype",
        "grad_max_norm", "label_smooth", "num_last_ckpt_keep",
        "lambda_ctc", "lambda_qua", "lambda_gp", "lr_scheduler",
        "compute_dtype", "adam_mu_dtype", "adam_nu_dtype", "fused_adam",
        "skip_nonfinite_grads", "zero1", "sequence_parallel",
        "pipeline_microbatch",
        "pretrained_model", "load_splayer", "G_path", "maxlen", "multi",
        "tensorboard", "profile",
    },
    "training.lr_scheduler": {
        "type", "warmup_step", "d_model", "x0", "y0", "x1", "y1",
        "decay_coef", "tolerate",
    },
    "model": {
        "type", "add_eos", "add_blk", "phone_size", "signal", "encoder",
        "decoder", "assigner", "cpc", "G", "D",
        # train_cpc's `sp` alias for `signal`; LM configs are flat at the
        # model level (bin/train_lm.py)
        "sp", "vocab_size", "d_model", "n_layers", "num_layers", "nhead",
        "dim_feedforward", "activation", "dropout_rate",
    },
    "model.signal": {
        "feature_type", "sample_rate", "num_mel_bins", "use_energy",
        "dither", "spec_aug", "d_model",
    },
    "model.signal.spec_aug": {
        "freq_mask_num", "freq_mask_width", "time_mask_num",
        "time_mask_width",
    },
    "model.encoder": {
        "type", "sub", "input_dim", "d_input", "d_model", "nhead",
        "dim_feedforward", "activation", "num_layers", "n_layers",
        "dropout_rate", "dropout", "remat", "pipeline", "vocab_size",
        "conv_dim", "freeze_finetune_updates", "subsample", "context_width",
        "streaming", "moe",
    },
    "model.encoder.sub": {"type", "layer_num"},
    "model.encoder.streaming": {"chunk", "left_chunks"},
    "model.encoder.moe": {
        "num_experts", "top_k", "capacity_factor", "every", "aux_weight",
        "router",
    },
    "model.decoder": {
        "type", "vocab_size", "d_model", "nhead", "num_layers",
        "encoder_dim", "dim_feedforward", "activation", "dropout_rate",
        "remat",
        # Embed_Decoder_CTC's 'decoder' section IS an encoder stack
        # (reference naming, Text_Models.py:117-124) and may carry moe;
        # validate_moe rejects it for every other model type
        "moe", "input_dim", "sub",
    },
    "model.assigner": {"type", "d_model", "n_layers", "w_context", "dropout"},
    "model.cpc": {"d_input", "d_coding", "n_layers", "n_steps"},
}
# the Embed_Decoder_CTC stack lives under 'decoder' and may carry moe;
# give the nested block the same schema so typos warn there too
_KNOWN_KEYS["model.decoder.moe"] = _KNOWN_KEYS["model.encoder.moe"]
# G/D reuse the encoder/decoder schemas
_KNOWN_KEYS["model.G"] = {"encoder", "decoder"}
_KNOWN_KEYS["model.D"] = {"encoder"}
_KNOWN_KEYS["model.G.encoder"] = _KNOWN_KEYS["model.encoder"]
_KNOWN_KEYS["model.G.decoder"] = _KNOWN_KEYS["model.decoder"]
_KNOWN_KEYS["model.G.encoder.moe"] = _KNOWN_KEYS["model.encoder.moe"]
_KNOWN_KEYS["model.G.decoder.moe"] = _KNOWN_KEYS["model.encoder.moe"]
# the discriminator front is a strided-conv stack, not a transformer
_KNOWN_KEYS["model.D.encoder"] = {"d_input", "d_model", "layer_num"}


def validate_moe(model_cfg: Mapping) -> None:
    """Semantic checks for `model.encoder.moe` (models/moe.py), raised at
    config-load time so a bad MoE config fails before any tracing:

      * the model type must collect the router load-balance auxiliary
        (`Framework.moe_capable` — a type whose loss path drops the sown
        aux would silently train an unbalanced router, risking expert
        collapse with no diagnostic);
      * `every >= 1` (0 would ZeroDivisionError inside the traced layer
        loop) and `every <= num_layers` (otherwise no layer index
        satisfies i % every == every - 1 and the model silently has zero
        MoE layers while the config claims MoE is on);
      * `top_k >= 1`, `num_experts >= 1`, `capacity_factor > 0`;
      * the encoder activation must be one MoEFeedForward implements
        (relu/gelu/glu).
    """
    model_cfg = model_cfg or {}
    sections = (
        ("encoder", model_cfg.get("encoder")),
        ("decoder", model_cfg.get("decoder")),
        ("G.encoder", (model_cfg.get("G") or {}).get("encoder")),
        # the GAN generator is an EmbedDecoderCTC: its 'decoder' section
        # builds a TransformerEncoder, so moe there must be policed too
        ("G.decoder", (model_cfg.get("G") or {}).get("decoder")),
    )
    for section, enc in sections:
        enc = enc if isinstance(enc, Mapping) else {}
        moe = enc.get("moe") or {}
        if not moe:
            continue
        prefix = f"model.{section}"
        path = f"{prefix}.moe"
        num = int(moe.get("num_experts", 0) or 0)
        if num < 1:
            if "num_experts" in moe:
                # explicit num_experts: 0 is the documented "MoE disabled"
                # spelling — the builders and Framework.moe_config() run
                # dense for it, so config load must accept it too (warn so
                # a typo'd 0 in an intended-MoE config is still visible)
                import warnings

                warnings.warn(
                    f"config: {path}.num_experts="
                    f"{moe.get('num_experts')!r} disables MoE — the "
                    f"model runs dense FFNs; remove the moe section to "
                    f"silence this"
                )
                continue
            raise ValueError(
                f"config: {path} is missing num_experts (>= 1 enables "
                f"MoE, 0 runs dense); got keys {sorted(moe)}"
            )
        mtype = model_cfg.get("type")
        if mtype is not None:
            from openasr_tpu.models import get_model_class

            cls = get_model_class(str(mtype))
            capable = (
                getattr(cls, "moe_capable", False)
                and getattr(cls, "moe_section", "encoder") == section
            )
            if not capable:
                options = sorted(_moe_capable_types())
                raise ValueError(
                    f"config: {path} is not supported for model type "
                    f"{mtype!r}: this family would never collect the MoE "
                    f"router's load-balance auxiliary from that section, "
                    f"so the router would silently train unbalanced "
                    f"(expert collapse with no error). MoE-capable "
                    f"(type, section) pairs: {options}"
                )
        every = int(moe.get("every", 2) or 0)
        if every < 1:
            raise ValueError(
                f"config: {path}.every must be >= 1 "
                f"(got {moe.get('every')!r})"
            )
        num_layers = enc.get("num_layers")
        if num_layers is not None and every > int(num_layers):
            raise ValueError(
                f"config: {path}.every={every} exceeds "
                f"{prefix}.num_layers={num_layers}: no layer index i "
                f"satisfies i % every == every - 1, so the model would "
                f"have ZERO MoE layers while the config claims MoE is on"
            )
        if int(moe.get("top_k", 2) or 0) < 1:
            raise ValueError(
                f"config: {path}.top_k must be >= 1 "
                f"(got {moe.get('top_k')!r})"
            )
        if float(moe.get("capacity_factor", 1.25) or 0.0) <= 0.0:
            raise ValueError(
                f"config: {path}.capacity_factor must be > 0 "
                f"(got {moe.get('capacity_factor')!r})"
            )
        act = enc.get("activation", "relu")
        from openasr_tpu.models.moe import MoEFeedForward

        if act not in MoEFeedForward.SUPPORTED_ACTIVATIONS:
            supported = "/".join(MoEFeedForward.SUPPORTED_ACTIVATIONS)
            raise ValueError(
                f"config: {prefix}.activation={act!r} has no MoE expert "
                f"implementation (MoEFeedForward supports {supported})"
            )
        router = moe.get("router", "topk")
        if router not in MoEFeedForward.SUPPORTED_ROUTERS:
            raise ValueError(
                f"config: {path}.router={router!r} unknown "
                f"(supported: {MoEFeedForward.SUPPORTED_ROUTERS})"
            )


def _moe_capable_types() -> list:
    """(type, section) pairs whose loss paths collect the MoE aux."""
    from openasr_tpu.models import MODEL_REGISTRY, get_model_class

    get_model_class("conv-ctc")  # force registry population
    return [
        (name, getattr(cls, "moe_section", "encoder"))
        for name, cls in MODEL_REGISTRY.items()
        if getattr(cls, "moe_capable", False)
    ]


def validate_config(config: Mapping, required: Sequence[str] = ()) -> list:
    """Check a loaded config tree against the known key surface.

    Unknown keys log a warning (with a closest-match hint) and are
    returned; missing `required` dotted paths raise ValueError with the
    path spelled out.  Sections without a schema entry (free-form, e.g.
    future extensions) are not descended into.
    """
    import difflib
    import logging

    unknown = []

    def walk(section: Mapping, path: str) -> None:
        known = _KNOWN_KEYS.get(path)
        if known is None:
            return
        for k, v in section.items():
            full = f"{path}.{k}" if path else str(k)
            if k not in known:
                hint = difflib.get_close_matches(str(k), known, n=1)
                msg = f"config: unrecognized key '{full}'"
                if hint:
                    msg += f" — did you mean '{hint[0]}'?"
                logging.warning(msg)
                unknown.append(full)
            elif isinstance(v, Mapping):
                walk(v, full)

    walk(config, "")
    validate_moe(config.get("model") or {})

    for path in required:
        node: Any = config
        for part in path.split("."):
            if not isinstance(node, Mapping) or part not in node:
                raise ValueError(
                    f"config: required key '{path}' is missing "
                    f"(stuck at '{part}')"
                )
            node = node[part]
    return unknown


def parse_range(value: Any) -> tuple | None:
    """Parse the reference's ad-hoc string ranges, e.g. feat_range: "1,1000"
    (reference: src/train.py:60-61)."""
    if value is None:
        return None
    if isinstance(value, (list, tuple)):
        lo, hi = value
        return int(lo), int(hi)
    parts = str(value).split(",")
    return int(parts[0]), int(parts[1])


def load_config(path: str) -> Config:
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return Config(raw or {})
