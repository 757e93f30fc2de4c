from .mesh import create_mesh, local_mesh, DATA_AXIS, MODEL_AXIS
from .partitioning import (
    param_partition_spec,
    shard_params,
    with_sharding,
)
from .distributed import (global_device_mesh, initialize_distributed,
                          is_main_process)
