from .mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate_params,
    data_sharding,
    replicated,
    maybe_initialize_distributed,
)  # noqa: F401
