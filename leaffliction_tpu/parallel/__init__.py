from leaffliction_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
