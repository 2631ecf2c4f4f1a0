from mpmc_tpu.models.bert import TextEncoder  # noqa: F401
from mpmc_tpu.models.pooling import Pooler  # noqa: F401
from mpmc_tpu.models.fusion import (  # noqa: F401
    MCA,
    MCA3,
    ConcatAttention,
    ConcatAttention3,
    CrossModalAttention,
    SelfAttentionFusion,
    make_fusion,
)
from mpmc_tpu.models.resnet import ResNet, TinyResNet, resnet18, resnet50  # noqa: F401
from mpmc_tpu.models.classifier import (  # noqa: F401
    ImageClassifier,
    ImageEncoderWithHead,
    MultimodalClassifier,
    PackedMultimodalClassifier,
    PackedTextClassifier,
    SimpleMultimodalClassifier,
    TextClassifier,
)
