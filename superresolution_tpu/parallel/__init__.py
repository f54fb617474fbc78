from superresolution_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from superresolution_tpu.parallel.spatial import spatial_shard_apply  # noqa: F401
