"""mpmc_tpu — TPU-native multimodal propaganda-meme classification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the ArAIEval 2024
Task-2 reference system (KevinMathewT/multimodal-propaganda-meme-classification):
binary propaganda / not_propaganda classification of Arabic memes in three
subtasks — 2A text-only, 2B image-only, 2C multimodal (text + image + caption).

Layers (bottom-up, mirroring SURVEY.md §7):
  io/        — JSON manifest loading, TSV emission, format checking, scoring
  text/      — Arabic/tweet normalization + WordPiece/BPE tokenization (C++ & Py)
  image/     — host JPEG decode (C++), device-side augmentation, prefetch pipeline
  models/    — flax encoders (BERT family, ResNet/ViT/ConvNeXt), pooling, fusion
  ops/       — Pallas/XLA kernels: attention, focal loss, fused image normalize
  parallel/  — jax.sharding Mesh construction + named-sharding helpers
  train/     — jitted bf16 train/eval steps, grouped-LR optimizers, metrics, ckpt
  cv/        — stratified k-fold, fold drivers, ensembling
  baselines/ — sklearn organizer baselines (majority/random/ngram/feature-SVM)
"""

__version__ = "0.1.0"

from mpmc_tpu.config import (  # noqa: F401
    DataConfig,
    FusionMethod,
    ModelConfig,
    PoolingType,
    Subtask,
    TrainConfig,
)

LABELS = ("not_propaganda", "propaganda")
L2ID = {"not_propaganda": 0, "propaganda": 1}
ID2L = {0: "not_propaganda", 1: "propaganda"}
