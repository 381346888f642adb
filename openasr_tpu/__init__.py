"""openasr_tpu — a TPU-native end-to-end speech recognition framework.

A from-scratch JAX/XLA/Pallas rebuild with the capability surface of the
OpenASR reference (Speech-Transformer / CTC / CIF / CPC / phone2char / GAN),
re-architected for TPU: pure-functional flax models, a single jitted train
step, mesh-based data+tensor parallelism, bucketed static shapes, and fused
Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Default PRNG: XLA's RngBitGenerator ("rbg") instead of threefry2x32.
# Threefry is a long VPU ALU chain that XLA cannot amortize — on the
# flagship bench it cost 13.6 ms of a 37.7 ms train step (dropout masks in
# every encoder/decoder layer); rbg generates the same masks in hardware
# for ~0 cost (measured 37.67 -> 24.10 ms/step, identical loss curves).
# All framework code uses impl-agnostic jax.random APIs (PRNGKey / fold_in
# / split / bits), so only the raw bit streams change, not semantics.
# Opt out (e.g. for cross-backend bit-exact reproducibility) with
# OPENASR_PRNG_IMPL=threefry2x32.
_prng_impl = _os.environ.get("OPENASR_PRNG_IMPL", "rbg")
if _prng_impl:
    _jax.config.update("jax_default_prng_impl", _prng_impl)

from openasr_tpu.config import Config, load_config  # noqa: F401
