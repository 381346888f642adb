"""Pallas TPU kernels for the hot ops.

`flash_attention` is the streaming attention kernel (see
kernels/flash_attention.py). Whether the model stack routes attention through
it is controlled here:

  * env var OPENASR_FLASH_ATTENTION = "1" / "0" / "auto" (default "auto":
    enabled on TPU backends, disabled elsewhere — on CPU the kernel only runs
    in interpret mode, which is for tests, not speed);
  * `set_flash_attention(True/False/None)` overrides at runtime (None = back
    to auto).

The flash path computes exact softmax(QK^T)V with padding/causal masking
AND train-time attention-probability dropout (the reference applies dropout
to attention weights through torch MultiheadAttention,
reference: src/third_party/transformer.py:161-189). The in-kernel mask is a
stateless positional hash so the forward and both backward kernels
regenerate it bit-identically; `attention_dropout_mask` exposes the same
mask in plain XLA for parity tests (tests/test_flash_attention.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from openasr_tpu.kernels.flash_attention import flash_attention  # noqa: F401

_override: Optional[bool] = None

# SPMD partitioning rules for the Pallas kernels (kernels/partition.py).
# Wrapping a kernel in custom_partitioning inserts a custom-call boundary
# that costs ~0.5 ms/step on a single chip (it blocks fusion around the
# kernel and the LayerNorm dgamma/dbeta fall back to XLA reductions), and
# buys nothing there — so it is enabled exactly when a >1-device mesh is
# built (make_mesh) and off otherwise.  Users jitting kernels manually
# under their own multi-device pjit must call set_spmd_partitioning(True).
_spmd_partitioning: bool = False


def set_spmd_partitioning(on: bool) -> None:
    global _spmd_partitioning
    _spmd_partitioning = bool(on)


def spmd_partitioning_enabled() -> bool:
    return _spmd_partitioning


_KNOWN_PLATFORMS = ("cpu", "tpu", "gpu", "cuda", "rocm")


def default_platform() -> str:
    """The platform computations actually run on. `jax.default_backend()`
    alone is wrong under the experimental 'axon' TPU plugin, which registers
    itself even when JAX_PLATFORMS=cpu; tests pin jax_default_device to cpu
    and this must win.  Conversely JAX_PLATFORMS may name a PJRT *plugin*
    ('axon') rather than a platform — returning that string verbatim would
    silently disable every platform=='tpu' feature gate (flash attention,
    fused fbank) on real TPU machines, so plugin names are resolved through
    the actual default device."""
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax validates this config at set time: a string here is always a
        # bare platform name ("cpu"/"tpu"/...), never a device spec or a
        # plugin name, so it can be returned verbatim
        return dev if isinstance(dev, str) else dev.platform
    env = os.environ.get("JAX_PLATFORMS", "")
    if env:
        plat = env.split(",")[0].strip().lower()
        if plat in _KNOWN_PLATFORMS:
            return plat
        try:
            return jax.devices()[0].platform
        except RuntimeError:
            return plat
    return jax.default_backend()


def set_flash_attention(value: Optional[bool]) -> None:
    global _override
    _override = value


def flash_attention_enabled() -> bool:
    if _override is not None:
        return _override
    env = os.environ.get("OPENASR_FLASH_ATTENTION", "auto").lower()
    if env in ("1", "true", "on"):
        return True
    if env in ("0", "false", "off"):
        return False
    return default_platform() == "tpu"


def flash_attention_forced() -> bool:
    """True when flash was EXPLICITLY requested (runtime override or env
    "1"), as opposed to platform-auto.  An explicit request bypasses the
    min/max-length crossover routing in the attention layers — "force
    flash" means flash, not "flash if the router agrees"."""
    if _override is True:
        return True
    return os.environ.get(
        "OPENASR_FLASH_ATTENTION", "auto"
    ).lower() in ("1", "true", "on")


def flash_attention_min_len() -> int:
    """Minimum sequence length for routing through the Pallas kernel
    (default 384).  Measured on the profiler's DEVICE lane — host
    wall-clock through this environment's relayed backend over-reports
    and even inverted the comparison — dense XLA attention wins below the
    crossover and flash wins above it (fwd+bwd, B=64, H=8, D=64):

        T=128  dense 2.1x faster   (per-program overhead still dominates)
        T=256  dense 1.1x faster
        T=512  flash 1.7x faster
        T=1024 flash 2.4x faster (B=16)

    (numbers with the all-heads-per-program kernels; 384 splits the
    measured crossover).  Flash also keeps O(T) attention
    memory, so long-sequence training routes through it regardless of
    speed parity.  Override with OPENASR_FLASH_MIN_LEN (0 = always
    flash)."""
    return int(os.environ.get("OPENASR_FLASH_MIN_LEN", "384"))


def flash_attention_max_len() -> int:
    """Optional length ceiling for the Pallas route (0 = none); an
    operator escape hatch above flash_attention_min_len."""
    return int(os.environ.get("OPENASR_FLASH_MAX_LEN", "0"))


_fbank_override: Optional[bool] = None


def set_fused_fbank(value: Optional[bool]) -> None:
    global _fbank_override
    _fbank_override = value


def fused_fbank_enabled() -> bool:
    if _fbank_override is not None:
        return _fbank_override
    env = os.environ.get("OPENASR_FUSED_FBANK", "auto").lower()
    if env in ("1", "true", "on"):
        return True
    if env in ("0", "false", "off"):
        return False
    return default_platform() == "tpu"


_layer_norm_override: Optional[bool] = None


def set_fused_layer_norm(value: Optional[bool]) -> None:
    global _layer_norm_override
    _layer_norm_override = value


def fused_layer_norm_enabled() -> bool:
    """Route LayerNorm through the one-pass Pallas kernel
    (kernels/layer_norm.py).  Same contract as the other gates: env var
    OPENASR_FUSED_LAYER_NORM 1/0/auto (auto = TPU only), runtime override
    wins.  models/layers.py:LayerNorm additionally requires a large-enough
    row count — tiny per-decode-step shapes stay on plain XLA."""
    if _layer_norm_override is not None:
        return _layer_norm_override
    env = os.environ.get("OPENASR_FUSED_LAYER_NORM", "auto").lower()
    if env in ("1", "true", "on"):
        return True
    if env in ("0", "false", "off"):
        return False
    return default_platform() == "tpu"
