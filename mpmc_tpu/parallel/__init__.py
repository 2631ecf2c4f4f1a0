from mpmc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from mpmc_tpu.parallel.tp import (  # noqa: F401
    count_sharded,
    shard_state,
    spec_for_path,
)
