import logging
import os

import jax

from openasr_tpu.utils.timer import Timer  # noqa: F401
from openasr_tpu.utils.metrics import edit_distance, batch_distance  # noqa: F401

logger = logging.getLogger(__name__)


def configure_compile_cache() -> None:
    """Enable JAX's persistent compilation cache for the CLI entry points
    (default dir /tmp/openasr_jax_cache; opt out with
    OPENASR_COMPILE_CACHE=0, redirect with JAX_COMPILATION_CACHE_DIR).

    On remote-compile TPU tunnels a cold flash-attention train step takes
    minutes to compile; with the cache, re-running the same CLI starts in
    seconds."""
    if os.environ.get("OPENASR_COMPILE_CACHE", "1") == "0":
        return
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/openasr_jax_cache"
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    # jax snapshots env-derived config at import time and jax is imported
    # before main() runs, so BOTH knobs must go through jax.config.update
    # (an env setdefault alone is a no-op here)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
        )
    except Exception:  # config name drift across jax versions: cache is
        pass           # best-effort, never fatal


def pin_default_device() -> None:
    """Honor OPENASR_DEVICE=cpu|tpu: pin eager dispatch (and therefore
    `make_mesh`'s platform resolution) to that backend.

    Needed because some accelerator plugins stay registered as the default
    backend even under JAX_PLATFORMS=cpu, which would silently route CPU
    smoke runs (egs/*/train_cpu.sh) through a device tunnel."""
    plat = os.environ.get("OPENASR_DEVICE", "").strip().lower()
    if not plat:
        return
    try:
        jax.config.update("jax_default_device", jax.devices(plat)[0])
        logger.info("OPENASR_DEVICE=%s: pinned default device", plat)
    except RuntimeError as e:  # unknown platform: fail loudly, not silently
        raise RuntimeError(
            f"OPENASR_DEVICE={plat!r} but no such backend is available"
        ) from e
