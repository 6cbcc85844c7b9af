from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    fsdp_param_sharding,
    initialize_multi_host,
    is_main_process,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .ops import (  # noqa: F401
    DistributedContext,
    all_gather_object,
    all_gather_tensor,
    broadcast_host_value,
    get_rank_safely,
    get_world_size,
    master_only,
    reduce_tensor_mean,
    synchronize,
)
