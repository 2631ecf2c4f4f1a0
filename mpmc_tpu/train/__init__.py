from mpmc_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    linear_warmup_schedule,
    make_eval_step,
    make_scan_train_step,
    make_train_step,
)
from mpmc_tpu.train.metrics import (  # noqa: F401
    optimal_threshold_youden,
    roc_curve,
    threshold_scan,
)
