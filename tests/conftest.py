"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is the TPU-world answer to testing multi-chip sharding without a pod:
XLA's host platform is split into 8 virtual devices, so `jax.sharding.Mesh`
tests exercise real collectives (SURVEY.md §4).
Must run before jax initializes its backends, hence env vars at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Some environments register an experimental TPU plugin that ignores
# JAX_PLATFORMS; pin the default device to CPU so unit tests never run
# over a device tunnel.
import jax

jax.config.update("jax_default_device", "cpu")
