from mpmc_tpu.io.manifest import Manifest, read_manifest  # noqa: F401
from mpmc_tpu.io.tsv import (  # noqa: F401
    check_format,
    read_predictions,
    write_label_tsv,
    write_prob_tsv,
)
from mpmc_tpu.io.scorer import evaluate, validate_files  # noqa: F401
