from openasr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    batch_sharding,
    replicated,
    param_shardings,
)
