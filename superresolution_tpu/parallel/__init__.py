from superresolution_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from superresolution_tpu.parallel.pipeline import (  # noqa: F401
    make_hat_group_pipeline,
    make_pipeline_forward,
    make_pipeline_loss,
    make_trunk_pipeline,
    pipeline_apply,
    split_scan_params,
)
from superresolution_tpu.parallel.spatial import (  # noqa: F401
    make_spatial_loss,
    spatial_shard_apply,
)
