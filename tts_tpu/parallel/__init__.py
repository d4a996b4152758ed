from .mesh import (  # noqa: F401
    get_mesh,
    replicate,
    shard_batch,
    with_data_parallel,
)
