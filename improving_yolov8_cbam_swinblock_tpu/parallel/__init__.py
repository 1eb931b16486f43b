from .mesh import batch_sharding, make_mesh, param_shardings, shard_params  # noqa: F401
