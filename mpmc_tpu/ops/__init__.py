from mpmc_tpu.ops.attention import dot_product_attention  # noqa: F401
from mpmc_tpu.ops.packing import (  # noqa: F401
    PackedBatch,
    pack_sequences,
    packed_sample_view,
    unpack_cls,
)
from mpmc_tpu.ops.losses import (  # noqa: F401
    sigmoid_focal_loss,
    softmax_cross_entropy,
)
