from mpmc_tpu.cv.kfold import stratified_kfold  # noqa: F401
from mpmc_tpu.cv.ensemble import (  # noqa: F401
    average_probability,
    majority_voting,
    threshold_optimization,
)
