from .mesh import (  # noqa: F401
    get_mesh,
    replicate,
    shard_batch,
    with_data_parallel,
)
from .ring_attention import (  # noqa: F401
    ring_self_attention,
    sequence_sharded_attention,
    shard_map_compat,
)
from .tp import gpt_tp_shardings  # noqa: F401
