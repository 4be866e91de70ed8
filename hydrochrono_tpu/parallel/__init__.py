from hydrochrono_tpu.parallel.sharding import (  # noqa: F401
    batch_mesh,
    make_batched_states,
    shard_batch,
    sharded_run,
)
