"""Model frameworks: linen module + params + per-component config packaging.

Every model family implements the reference's Framework protocol
(reference: src/frameworks/__init__.py:5-62): construction from YAML config
sections via `create_model`, a loss-producing training forward, encode /
decode entry points, and `package`/`restore` with per-component
{config, state} pairs and key-by-key config-compatibility validation
(reference: src/frameworks/Speech_Models.py:219-255).

Here the module is pure (flax.linen) and the Framework object is a thin
host-side owner of (module, params, configs); all compute paths are jittable
functions of explicit params.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openasr_tpu.config import Config

# Config keys tolerated to differ between a checkpoint and the current
# model (reference skips dropout_rate and spec_aug in its checks,
# Speech_Models.py:230-246).
VOLATILE_CONFIG_KEYS = {"dropout_rate", "spec_aug", "dither", "dropout"}

MODEL_REGISTRY: Dict[str, type] = {}


def register_model(name: str):
    def wrap(cls):
        cls.model_type = name
        MODEL_REGISTRY[name] = cls
        return cls

    return wrap


# Reference YAMLs are inconsistent about type spelling (e.g. `Conv_CTC` in
# egs/callhome_hkust/configs/ctc_ja.yaml vs `conv-ctc` in src/train.py:112);
# resolution is case-insensitive over `-`/`_` with these extra spellings.
_MODEL_ALIASES = {
    "cpc_model": "encoder_cpc",  # reference class name (frameworks/CPC.py)
}


def _normalize(name: str) -> str:
    return name.lower().replace("-", "_")


def get_model_class(name: str) -> type:
    if name not in MODEL_REGISTRY:
        # import model families lazily so the registry is populated
        import contextlib

        for mod in ("speech", "cif", "cpc", "text", "lm", "gan", "wav2vec"):
            with contextlib.suppress(ImportError):
                __import__(f"openasr_tpu.models.{mod}")
    if name not in MODEL_REGISTRY:
        norm = _MODEL_ALIASES.get(_normalize(name), _normalize(name))
        by_norm = {_normalize(k): k for k in MODEL_REGISTRY}
        if norm in by_norm:
            return MODEL_REGISTRY[by_norm[norm]]
        raise ValueError(
            f"Unknown model type {name!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name]


_replicate_cache: dict = {}


def _to_numpy(tree):
    """Fetch a pytree to host NumPy.  Multi-host: a leaf sharded over
    another host's devices can't be read locally — all hosts collectively
    replicate it first (every host must therefore reach package() before
    host 0 writes; see Solver.save).

    Replication runs on the leaf's OWN mesh: `multihost_utils` consults
    the DEFAULT backend, which under a foreign accelerator plugin can be
    a single-process device tunnel that disagrees with the mesh the
    arrays actually live on (same rule as parallel/mesh.py's
    mesh_process_index / _allgather_host_data)."""

    def fetch(x):
        if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.is_fully_replicated
        ):
            sh = x.sharding
            if isinstance(sh, jax.sharding.NamedSharding):
                mesh = sh.mesh
                rep_fn = _replicate_cache.get(mesh)
                if rep_fn is None:
                    out = jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec()
                    )
                    if len(_replicate_cache) > 16:
                        _replicate_cache.clear()
                    rep_fn = _replicate_cache[mesh] = jax.jit(
                        lambda a: a, out_shardings=out
                    )
                return np.asarray(rep_fn(x))
            # non-Named shardings don't carry a mesh; fall back
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def _check_config_compat(name: str, current: dict, saved: dict) -> None:
    for key, value in (current or {}).items():
        if key in VOLATILE_CONFIG_KEYS:
            continue
        if isinstance(value, dict):
            _check_config_compat(f"{name}.{key}", value, (saved or {}).get(key) or {})
            continue
        if saved is None or saved.get(key) != value:
            raise ValueError(
                f"{name} config mismatch on {key!r}: "
                f"current={value!r} saved={(saved or {}).get(key)!r}"
            )


class Framework:
    """Base: owns module + variables + configs."""

    model_type: str = "base"
    # True for families whose loss() collects the MoE routers'
    # load-balance auxiliary via apply_with_moe_aux (models/moe.py).
    # Families that leave this False reject a `moe:` section at
    # construction — a router whose balance loss is silently dropped
    # trains toward expert collapse with no diagnostic.  `moe_section`
    # names the config section the family's TransformerEncoder is built
    # from ("decoder" for Embed_Decoder_CTC, whose stack reuses the
    # reference's 'decoder' naming, Text_Models.py:117-124).
    moe_capable: bool = False
    moe_section: str = "encoder"

    def __init__(
        self,
        module,
        params,
        configs: Config,
        batch_stats: Optional[Any] = None,
    ):
        self.module = module
        self.params = params
        self.configs = configs if isinstance(configs, Config) else Config(configs)
        self.batch_stats = batch_stats
        expected = type(self).moe_section if type(self).moe_capable else None
        stray = [s for s in self._moe_sections_present() if s != expected]
        if stray:
            raise ValueError(
                f"moe is not supported in config section(s) {stray} for "
                f"model type {self.model_type!r}: "
                + (
                    f"this family reads its MoE config from "
                    f"{expected!r} only."
                    if expected
                    else "its loss path does not collect the MoE "
                    "router's load-balance auxiliary (the router would "
                    "silently train unbalanced). Remove the moe section "
                    "or use an MoE-capable model type."
                )
            )

    # ------------------------------------------------------------ variables

    @property
    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v

    def num_params(self) -> int:
        return sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(self.params)
        )

    # ------------------------------------------------------------ packaging

    def component_configs(self) -> Dict[str, dict]:
        """Per-component config sections; override per family."""
        return {k: v for k, v in self.configs.to_dict().items()}

    def package(self) -> dict:
        """Checkpoint package: model type + configs + per-component states
        (component = top-level param-tree key)."""
        params = _to_numpy(self.params)
        pkg = {
            "model_type": self.model_type,
            "configs": self.configs.to_dict(),
            "components": {name: params[name] for name in params},
        }
        if self.batch_stats is not None:
            pkg["batch_stats"] = _to_numpy(self.batch_stats)
        return pkg

    def restore(self, pkg: dict, without_fc: bool = False) -> None:
        """Load states after validating config compatibility.  `without_fc`
        keeps the current (freshly initialized) output projection/embedding
        for transfer learning (reference: Speech_Models.py:249-255,
        train.py:126-130)."""
        saved_cfg = pkg.get("configs", {})
        for section, cfg in self.configs.to_dict().items():
            if isinstance(cfg, dict):
                _check_config_compat(section, cfg, saved_cfg.get(section))
        new_params = dict(self.params)
        skip = self.fc_component_names() if without_fc else ()
        for name, state in pkg["components"].items():
            if name in skip:
                continue
            if name not in new_params:
                raise ValueError(f"Component {name!r} not in current model")
            new_params[name] = jax.tree_util.tree_map(jnp.asarray, state)
        self.params = new_params
        if "batch_stats" in pkg and self.batch_stats is not None:
            self.batch_stats = jax.tree_util.tree_map(
                jnp.asarray, pkg["batch_stats"]
            )

    def fc_component_names(self) -> tuple:
        """Components treated as 'fc' for without_fc partial restore."""
        return ("decoder", "fc", "ctc_fc")

    # --------------------------------------------------------------- helpers

    def _moe_sections_present(self) -> list:
        """Config sections carrying a configured moe block — scanned in
        full (encoder, decoder, G.encoder) so the construction guard
        fires on a moe section the family would otherwise silently
        ignore (e.g. `decoder.moe` on conv-ctc-transformer, whose
        decoder builder never reads it)."""
        cfg = self.configs.to_dict()
        found = []
        for name, sub in (
            ("encoder", cfg.get("encoder")),
            ("decoder", cfg.get("decoder")),
            ("G.encoder", (cfg.get("G") or {}).get("encoder")),
            # the GAN generator IS an EmbedDecoderCTC module: its
            # 'decoder' section builds a TransformerEncoder, so moe
            # there would create routers whose aux no GAN loss collects
            ("G.decoder", (cfg.get("G") or {}).get("decoder")),
        ):
            moe = ((sub or {}) if isinstance(sub, dict) else {}).get("moe") or {}
            if int(moe.get("num_experts", 0) or 0) > 0:
                found.append(name)
        return found

    def moe_config(self) -> Optional[dict]:
        """The family's moe section when MoE layers are configured, else
        None (models/moe.py).  Read from `moe_section` — the config
        section this family builds its TransformerEncoder from."""
        cfg = self.configs.to_dict()
        enc = cfg.get(type(self).moe_section) or {}
        moe = (enc.get("moe") or {}) if isinstance(enc, dict) else {}
        return moe if int(moe.get("num_experts", 0) or 0) > 0 else None

    def apply_with_moe_aux(self, variables, *args, **kwargs):
        """`module.apply` that also collects the MoE routers' load-balance
        auxiliary (sown into the 'moe' collection, models/moe.py).

        Returns (outputs, weighted_aux) — weighted_aux is None for models
        without MoE layers, else encoder.moe.aux_weight (default 0.01)
        times the mean of the per-layer Switch-style auxiliaries, ready
        to add to the training objective (Solver.total_loss)."""
        moe = self.moe_config()
        if moe is None:
            return self.module.apply(variables, *args, **kwargs), None
        out, coll = self.module.apply(
            variables, *args, mutable=["moe"], **kwargs
        )
        leaves = jax.tree_util.tree_leaves(coll.get("moe", {}))
        aux = sum(leaves) / max(len(leaves), 1)
        return out, float(moe.get("aux_weight", 0.01)) * aux

    def batch_inputs(self, batch: dict):
        """Pick wave or feature inputs per the signal config."""
        if self.configs.signal and self.configs.signal.get("feature_type") == "fbank":
            return batch["waves"], batch["wave_lengths"]
        if "feats" in batch:
            return batch["feats"], batch["feat_lengths"]
        return batch["waves"], batch["wave_lengths"]

    def attention_maps(self, batch: dict, average_heads: bool = False):
        """Attention distributions of a deterministic forward, as
        {module_path: [B, H, Tq, Tk] float32} (head-averaged [B, Tq, Tk]
        with average_heads, matching what torch's MHA returned through the
        reference's `return_atten`, third_party/transformer.py:161-189 —
        the basis of its TensorBoard attention visualizations).

        Runs the dense XLA attention path (the flash kernel never
        materializes probabilities) and captures the weights sown as flax
        'intermediates' by MultiHeadAttention — zero cost to training,
        where the sow is dead code and XLA removes it."""
        import inspect

        import openasr_tpu.kernels as kernels

        inputs, lengths = self.batch_inputs(batch)
        call = type(self.module).__call__
        n_pos = len([
            p for p in inspect.signature(call).parameters
            if p not in ("self", "deterministic")
        ])
        if n_pos == 2:
            args = (inputs, lengths)
        elif n_pos == 4:
            from openasr_tpu.models.speech import target_lengths_of

            args = (
                inputs, lengths, batch["ids"],
                target_lengths_of(batch["paddings"]),
            )
        else:
            raise NotImplementedError(
                f"attention_maps: unsupported forward arity for "
                f"{type(self.module).__name__}"
            )
        prev = kernels._override
        kernels.set_flash_attention(False)
        try:
            _, inter = self.module.apply(
                self.variables, *args, deterministic=True,
                mutable=["intermediates"],
            )
        finally:
            kernels.set_flash_attention(prev)

        maps = {}

        def walk(tree, path):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(v, path + (k,))
            else:  # sow stores a tuple of occurrences
                for i, v in enumerate(tree):
                    key = "/".join(path[:-1]) + ("" if len(tree) == 1 else f"#{i}")
                    maps[key] = jnp.mean(v, axis=1) if average_heads else v

        walk(inter["intermediates"], ())
        return maps
