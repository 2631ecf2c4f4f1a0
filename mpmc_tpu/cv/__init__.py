from mpmc_tpu.cv.kfold import stratified_kfold  # noqa: F401
from mpmc_tpu.cv.ensemble import (  # noqa: F401
    average_probability,
    family_weight_scan,
    group_average,
    majority_voting,
    threshold_optimization,
)
