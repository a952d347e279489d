from diffsheg_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from diffsheg_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    fsdp_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_params_fsdp,
)
from diffsheg_tpu.parallel.collectives import (  # noqa: F401
    all_reduce_mean_metrics,
    barrier,
    gather_arrays,
)
