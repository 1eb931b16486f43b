from .distributed import (  # noqa: F401
    barrier,
    broadcast_scalar,
    init_distributed,
    is_main_process,
    local_shard_info,
    multihost_env_detected,
)
from .mesh import batch_sharding, make_mesh, param_shardings, shard_params  # noqa: F401
