"""openasr_tpu — a TPU-native end-to-end speech recognition framework.

A from-scratch JAX/XLA/Pallas rebuild with the capability surface of the
OpenASR reference (Speech-Transformer / CTC / CIF / CPC / phone2char / GAN),
re-architected for TPU: pure-functional flax models, a single jitted train
step, mesh-based data+tensor parallelism, bucketed static shapes, and fused
Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from openasr_tpu.config import Config, load_config  # noqa: F401
