from mpmc_tpu.utils.seed import seed_everything  # noqa: F401
from mpmc_tpu.utils.profiling import StepTimer, trace  # noqa: F401
