from mpmc_tpu.image.decode import decode_image, decode_batch  # noqa: F401
from mpmc_tpu.image.augment import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    eval_preprocess,
    train_augment,
)
from mpmc_tpu.image.pipeline import ImagePipeline  # noqa: F401
