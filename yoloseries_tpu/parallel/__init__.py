from .mesh import (
    batch_sharding,
    make_mesh,
    process_count,
    process_index,
    replicate_state,
    replicated,
    shard_batch,
    maybe_initialize_distributed,
)
