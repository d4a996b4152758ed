from .mesh import (  # noqa: F401
    get_mesh,
    replicate,
    shard_batch,
    with_data_parallel,
)
from .tp import gpt_tp_shardings  # noqa: F401
