from mpmc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from mpmc_tpu.parallel.pp import (  # noqa: F401
    make_pipeline_fn,
    make_pp_forward,
    make_pp_train_step,
    merge_stage_params,
    place_pp_params,
    split_stage_params,
)
from mpmc_tpu.parallel.sp import (  # noqa: F401
    make_sp_forward,
    make_sp_stack,
    make_sp_train_step,
    place_sp_params,
)
from mpmc_tpu.parallel.tp import (  # noqa: F401
    count_sharded,
    shard_state,
    spec_for_path,
)
