"""Typed configuration for the whole framework.

The reference scatters configuration across module-level globals mutated inside
``setup()`` (reference ``example_scripts/Multimodal_example_task2C.py:51-84``),
argparse CLIs (``baselines/subtask_2a.py:120-127``) and ``sys.argv`` fold
indices (``textmodel_example_task2A.py:186-192``).  Here a single frozen
dataclass tree covers subtask, encoders, fusion, loss, schedule and mesh so
every entry point shares one config surface (SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class Subtask(str, enum.Enum):
    A = "2A"  # text-only
    B = "2B"  # image-only
    C = "2C"  # multimodal


class PoolingType(str, enum.Enum):
    """Six pooling strategies of the reference text head.

    Reference: ``Multimodal_example_task2C.py:338-392`` (cls / nopooling / max /
    mean / attention / cnn).
    """

    CLS = "cls"
    NOPOOLING = "nopooling"
    MAX = "max"
    MEAN = "mean"
    ATTENTION = "attention"
    CNN = "cnn"


class FusionMethod(str, enum.Enum):
    """Four fusion mechanisms (reference ``Multimodal_example_task2C.py:617-630``)."""

    CONCATENATION = "concatenation"  # ConcatAttention / ConcatAttention3
    MCA = "mca"                      # additive (Bahdanau-style) attention
    CROSS_MODAL = "cross_modal"      # bidirectional MHA
    SELF_ATTENTION = "self_attention"  # stacked-token MHA


class LossType(str, enum.Enum):
    FOCAL = "focal"           # sigmoid focal loss (2C: alpha=.25 gamma=2)
    CROSS_ENTROPY = "ce"      # 2-class CE (2A path)


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    """BERT-family encoder hyperparameters (AraBERT/QARiB/RoBERTa compatible)."""

    vocab_size: int = 64000           # aubmindlab/bert-base-arabertv2
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 0
    # RoBERTa-style position offset: positions start at pad_token_id+1.
    roberta_style_positions: bool = False
    # tanh-approximate GELU: faster on the VPU than exact erf; HF BERT uses
    # exact, so keep False when loading converted checkpoints for parity.
    gelu_approx: bool = False

    @staticmethod
    def arabertv2() -> "TextEncoderConfig":
        return TextEncoderConfig(vocab_size=64000)

    @staticmethod
    def qarib() -> "TextEncoderConfig":
        return TextEncoderConfig(vocab_size=64000)

    @staticmethod
    def roberta_base() -> "TextEncoderConfig":
        return TextEncoderConfig(
            vocab_size=50265, max_position_embeddings=514,
            type_vocab_size=1, pad_token_id=1, roberta_style_positions=True,
            layer_norm_eps=1e-5,
        )

    @staticmethod
    def distilbert_multilingual() -> "TextEncoderConfig":
        # distilbert-base-multilingual-cased (reference DistilBERT_example_task2A.py:87)
        return TextEncoderConfig(vocab_size=119547, num_layers=6)

    @staticmethod
    def tiny(vocab_size: int = 512) -> "TextEncoderConfig":
        """Small config for tests/smoke runs."""
        return TextEncoderConfig(
            vocab_size=vocab_size, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position_embeddings=128,
        )


@dataclasses.dataclass(frozen=True)
class ImageEncoderConfig:
    """Image backbone selection (reference timm zoo, ``Untitled-2.py:362-371``)."""

    arch: str = "resnet18"            # resnet18|resnet50|vit_base_16|convnext_tiny|tiny_resnet
    image_size: int = 224
    feature_dim: int = 512            # backbone output feature dim
    finetune_dim: int = 512           # MLP head width (CustomDenseNet161 head, :571-575)
    finetune_dropout: float = 0.35
    patch_size: int = 16              # ViT only
    grayscale: bool = False           # ResNet_example_task2B.py:156 variant

    @staticmethod
    def tiny() -> "ImageEncoderConfig":
        # From-scratch tiny ResNet in the HF-Trainer 2B example
        # (reference ResNet_example_task2B.py:146-152: depths [2,2], widths [32,64]).
        return ImageEncoderConfig(arch="tiny_resnet", image_size=64, feature_dim=64,
                                  finetune_dim=64)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    subtask: Subtask = Subtask.C
    # text=None drops the Arabic-text branch (image+caption 2B variant, C23)
    text: Optional[TextEncoderConfig] = dataclasses.field(
        default_factory=TextEncoderConfig)
    caption: Optional[TextEncoderConfig] = dataclasses.field(
        default_factory=TextEncoderConfig.roberta_base)
    image: Optional[ImageEncoderConfig] = dataclasses.field(
        default_factory=ImageEncoderConfig)
    pooling: PoolingType = PoolingType.CLS
    fusion: FusionMethod = FusionMethod.CONCATENATION
    proj_dim: int = 512               # per-modality FC projection width (:596-600)
    dropout: float = 0.3              # per-modality dropout (:592)
    num_classes: int = 1              # 1 = single-logit sigmoid path (2C); 2 = CE path (2A)
    max_text_len: int = 512
    max_caption_len: int = 512

    @staticmethod
    def small_2a() -> "ModelConfig":
        """From-scratch small text config (no pretrained weights needed):
        10-fold × 20 epochs at lr 3e-4 / bs 32 reaches mean dev-fold
        macro-F1 0.655 on real ArAIEval text — beating the published n-gram
        SVM baseline (0.579) in every fold (see STATUS.md)."""
        return ModelConfig(
            subtask=Subtask.A,
            text=TextEncoderConfig(vocab_size=512, hidden_size=128,
                                   num_layers=4, num_heads=4,
                                   intermediate_size=256,
                                   max_position_embeddings=128),
            caption=None, image=None, num_classes=2, max_text_len=64)

    @staticmethod
    def small_2c() -> "ModelConfig":
        """From-scratch small 2C for environments without pretrained
        weights: the small_2a text encoder (MLM-pretrainable via
        ``cfg.mlm_epochs``) + a tiny ResNet image branch, no caption
        branch, single-logit focal head — the quality-bearing 2C variant
        when the text modality carries the only real signal (images are
        synthetic in this environment)."""
        return ModelConfig(
            subtask=Subtask.C,
            text=TextEncoderConfig(vocab_size=512, hidden_size=128,
                                   num_layers=4, num_heads=4,
                                   intermediate_size=256,
                                   max_position_embeddings=128),
            caption=None,
            image=ImageEncoderConfig(arch="tiny_resnet", image_size=64,
                                     feature_dim=64, finetune_dim=64),
            proj_dim=128, num_classes=1, max_text_len=64)

    @staticmethod
    def clip_style_2c() -> "ModelConfig":
        """Working CLIP-style dual-encoder 2C config — ViT-B/32 image trunk +
        BERT text encoder + fusion head (the reference's CLIP attempt,
        ``mm_model_mm_example_task2C.py``, was abandoned non-runnable; this is
        the functional equivalent)."""
        return ModelConfig(
            image=ImageEncoderConfig(arch="vit_base_32", feature_dim=768),
            caption=None)

    @staticmethod
    def captions_2b() -> "ModelConfig":
        """Image+caption 2B variant (C23) — the reference's
        ``imagemodel_example_task2B.py`` intent, minus its NameError."""
        return ModelConfig(text=None)

    @staticmethod
    def simple_2c() -> "ModelConfig":
        """C28 — the organizers' simple 2C baseline preset
        (``Multimodal_example_task2C.txt``): distilbert-base-multilingual
        text branch, torchvision resnet50 logits image branch, 2-class CE,
        no augmentation (Resize256/CenterCrop224 eval transform only,
        ``:37-41``).  Consumed by ``SimpleMultimodalClassifier``."""
        return ModelConfig(
            subtask=Subtask.C,
            text=TextEncoderConfig.distilbert_multilingual(),
            caption=None,
            image=ImageEncoderConfig(arch="resnet50", feature_dim=2048),
            num_classes=2, max_text_len=128)

    @staticmethod
    def tiny_2c() -> "ModelConfig":
        return ModelConfig(
            subtask=Subtask.C,
            text=TextEncoderConfig.tiny(),
            caption=TextEncoderConfig.tiny(),
            image=ImageEncoderConfig.tiny(),
            proj_dim=64, max_text_len=32, max_caption_len=16,
        )


def model_config_to_dict(cfg: ModelConfig) -> dict:
    """JSON-serializable dict of a (resolved) ModelConfig — persisted next to
    checkpoints as ``run_meta.json`` so ``predict`` can rebuild the exact
    trained model variant (arch, vocab sizes, pooling, heads) instead of
    guessing from CLI flags (VERDICT r2: restored 2B-zoo checkpoints had no
    inference path)."""
    d = dataclasses.asdict(cfg)

    def _plain(obj):
        if isinstance(obj, enum.Enum):
            return obj.value
        if isinstance(obj, dict):
            return {k: _plain(v) for k, v in obj.items()}
        return obj

    return _plain(d)


def model_config_from_dict(d: dict) -> ModelConfig:
    """Inverse of :func:`model_config_to_dict`."""
    d = dict(d)
    for key, cls in (("text", TextEncoderConfig),
                     ("caption", TextEncoderConfig),
                     ("image", ImageEncoderConfig)):
        if d.get(key) is not None:
            d[key] = cls(**d[key])
    d["subtask"] = Subtask(d["subtask"])
    d["pooling"] = PoolingType(d["pooling"])
    d["fusion"] = FusionMethod(d["fusion"])
    return ModelConfig(**d)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    train_manifest: str = "data/arabic_memes_propaganda_araieval_24_train.json"
    dev_manifest: str = "data/arabic_memes_propaganda_araieval_24_dev.json"
    test_manifest: Optional[str] = None
    image_root: str = "."
    batch_size: int = 16              # reference :154-162
    eval_batch_size: int = 16
    num_folds: int = 5                # 2C: 5 folds over train (seed 42)
    fold_seed: int = 42
    fold_over_train_plus_dev: bool = False  # 2A: 10-fold over train+dev (:221-230)
    normalize_arabic: bool = True
    cache_dir: str = ".cache"         # caption + tokenization cache (unlike reference)
    # Corpus-derived vocabulary family when no pretrained vocab file is
    # given: "words" = whole-word + char fallback (the original offline
    # default); "subword" = BPE-learned WordPiece pieces
    # (text/wordpiece_learn.py) — morphology-aware subwords, the vocab-level
    # answer to the char-n-gram SVM's signal on this corpus.
    corpus_vocab_mode: str = "words"
    corpus_vocab_size: int = 30000
    # Raise (instead of warn + synthesize pixels) when manifest images are
    # missing under image_root — set for real training/scoring runs.
    strict_images: bool = False
    # Sequence bucketing: trim token arrays to the shortest multiple of this
    # that covers every real token in the corpus (max_text_len stays the
    # truncation cap).  The reference pads everything to 512
    # (Multimodal_example_task2C.py:276) while meme OCR text averages ~12
    # words — on TPU that pads >90% of the encoder matmul FLOPs away, so
    # trimming is the single largest throughput lever.  Identity for the
    # masked poolings (cls/mean/attention); 0 disables (max/cnn pooling and
    # the C28 simple preset's last-token semantics depend on pad length).
    seq_bucket_multiple: int = 64
    # Sequence PACKING (text drivers): >0 trains on batches of this many
    # packed rows instead of `batch_size` per-sample rows — each epoch's
    # shuffled order is packed end-to-end into bucket-length rows with
    # segment-masked attention (ops/packing.py, train/packed.py; the corpus
    # averages ~15 tokens vs the 128 bucket, so one packed row carries ~8
    # samples).  Throughput mode: per-sample numerics are exact, batch
    # COMPOSITION changes (~8x more samples per optimizer step).  Eval stays
    # unpacked.  Requires a masked pooling; forces the host-batch path.
    pack_rows: int = 0
    # Device-resident dataset: upload each split's arrays to HBM once and
    # assemble every batch ON DEVICE (jitted index-gather inside the train/
    # eval step) — the host ships only [B] int32 row indices per step.  Over
    # a remote/tunneled TPU link (measured ~25-50 MB/s H2D here) streaming
    # the 2.4 MB of uint8 pixels per bs16 batch costs more than the whole
    # device step; the full train split is ~322 MB — trivial against 16 GB
    # HBM.  Disable for datasets that do not fit device memory.
    device_resident: bool = True


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for SPMD execution.

    Axis naming keeps a ("dcn", "ici") factoring possible (SURVEY.md §2.3) even
    though a single host only exercises ICI.  ``data`` shards the batch (DP);
    ``fold`` optionally trains k folds simultaneously with stacked weights.
    """

    data_axis: str = "data"
    fold_axis: str = "fold"
    num_fold_shards: int = 1          # mesh extent of the fold axis
    # >1 shards each batch over `data` for plain data-parallel training in
    # the sequential fold driver (params replicated, gradients psum'd by
    # XLA's SPMD partitioner).  Ignored when fold-parallel is active (that
    # mesh derives its data extent from the device count).
    num_data_shards: int = 1
    # Train all k folds simultaneously as one stacked-weights SPMD program
    # even when the fold mesh axis is smaller than k (num_fold_shards must
    # divide num_folds; 1 puts every fold on each device).  On a SINGLE
    # chip this is a pure MFU lever: the per-layer matmuls carry an
    # F-times-larger effective batch through the same program, amortizing
    # the optimizer pass and dispatch overheads across folds.
    # ``num_fold_shards > 1`` implies it.
    fold_parallel: bool = False
    # >1 adds a trailing `model` mesh axis and shards the transformer
    # weights Megatron-style (parallel/tp.py): QKV + MLP-in kernels
    # column-split, attention-out + MLP-out kernels row-split, XLA
    # inserting the two all-reduces per layer over ICI.  At these model
    # sizes (110-135M params) DP alone is usually the right layout
    # (SURVEY.md §2.3) — TP exists for larger drop-in encoders and is
    # validated on the virtual mesh by the multichip dryrun.  Mutually
    # exclusive with fold-parallel (stacked-weights folds already consume
    # the non-data axis).
    num_model_shards: int = 1
    model_axis: str = "model"
    # >1 pipelines the transformer layer stack over a trailing `stage` mesh
    # axis (parallel/pp.py, GPipe schedule): each stage row holds 1/S of
    # the encoder layers (per-chip transformer HBM scales 1/S), microbatch
    # activations flow stage-to-stage through one neighbour ppermute per
    # schedule tick, and the reverse schedule is the autodiff transpose.
    # Driver mode for the 2A text model (`train --pipeline-stages`).
    # DROPOUT TRADE: encoder-layer dropout runs DETERMINISTIC inside the
    # pipelined region (flax rng plumbing doesn't cross shard_map);
    # embedding dropout is live.  Mutually exclusive with fold/model/seq.
    num_stage_shards: int = 1
    stage_axis: str = "stage"
    # Microbatches per pipeline flush; 0 = auto (4× stages — GPipe bubble
    # fraction (S-1)/(M+S-1) ≤ ~20%).  Must divide the batch size.
    pp_microbatches: int = 0
    # >1 shards the transformer stack's ACTIVATIONS over a trailing `seq`
    # mesh axis (parallel/sp.py): per-token ops stay local, attention mixes
    # across shards via ring attention or Ulysses (mesh.sp_impl).  Driver
    # mode for the 2A text model (`train --seq-shards`).  Same dropout
    # trade as pipeline stages (layer dropout deterministic in-region).
    num_seq_shards: int = 1
    seq_axis: str = "seq"
    # Sequence-parallel attention impl: "ring" (K/V blocks rotate via
    # neighbour ppermute, nothing [S,S] materialized) or "ulysses" (two
    # all_to_all re-shards, exact local attention over H/P heads).
    sp_impl: str = "ring"

    @property
    def is_fold_parallel(self) -> bool:
        return self.fold_parallel or self.num_fold_shards > 1

    def axis_names(self) -> Tuple[str, ...]:
        if self.is_fold_parallel:
            return (self.fold_axis, self.data_axis)
        if self.num_model_shards > 1:
            return (self.data_axis, self.model_axis)
        if self.num_stage_shards > 1:
            return (self.data_axis, self.stage_axis)
        if self.num_seq_shards > 1:
            return (self.data_axis, self.seq_axis)
        return (self.data_axis,)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    loss: LossType = LossType.FOCAL
    focal_alpha: float = 0.25         # reference :711
    focal_gamma: float = 2.0
    learning_rate: float = 1e-5       # 2C Adam lr (:168)
    encoder_lr_scale: float = 0.8     # text/image groups at 0.8*lr (:645-664)
    warmup_fraction: float = 0.1      # linear warmup over 10% of steps (:170-174)
    # LR schedule shape: "linear_warmup" = HF get_linear_schedule_with_warmup
    # (2C flagship, Multimodal_example_task2C.py:170-174); "constant" = no
    # schedule at all — the 2A flagship trains with ``scheduler = None``
    # (textmodel_example_task2A.py:574-576), i.e. plain Adam at the base LR.
    lr_schedule: str = "linear_warmup"
    grad_clip_norm: float = 1.0       # bf16 path clip (reference fp16 clip=1.0 :714)
    epochs: int = 8                   # 2C (:177); 2A uses 20
    seed: int = 42
    eval_per_epoch: int = 2           # mid-epoch eval twice/epoch (:697,755)
    bf16: bool = True                 # replaces torch AMP fp16 + GradScaler
    use_class_weights: bool = False   # reference computes but never uses them (:137-139)
    run_id: str = "mpmc_tpu"
    team_name: str = "kevinmathew"
    # TSV emission contract: None → ROC/Youden threshold (2C semantics,
    # Multimodal_example_task2C.py:819-822); 0.5 → argmax (2A semantics,
    # textmodel_example_task2A.py:533).
    emit_threshold: Optional[float] = None
    prob_header: str = "prob"
    emit_val_tsv: bool = False  # 2A also dumps val-split TSVs (:464-468)
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    # When set, fit() captures a jax.profiler trace (viewable in
    # TensorBoard/XProf) around a few steady-state train dispatches of
    # epoch 0 — first-class observability the reference lacks (SURVEY §5.1).
    profile_dir: Optional[str] = None
    # Adam first-moment accumulator dtype (optax mu_dtype).  "bfloat16"
    # halves the HBM traffic of the mu read-modify-write on ~270M flagship
    # params; the variance accumulator stays f32.  None keeps torch-Adam
    # f32 parity (the default).
    adam_mu_dtype: Optional[str] = None
    # Corpus MLM pretraining (train/pretrain.py): when > 0 and no external
    # text checkpoint is given, the driver first runs this many epochs of
    # masked-language-model pretraining over the task corpus (with char-
    # noise augmentation) and initializes every fold's text encoder from the
    # result — the no-external-weights quality lever for offline
    # environments (the reference's quality comes from downloaded QARiB/
    # AraBERT weights, textmodel_example_task2A.py:41-44).
    mlm_epochs: int = 0
    # Classic→neural distillation (train/distill.py): when > 0, the 2A
    # driver fits the calibrated char-n-gram SVM (the repo's strongest
    # classic model, baselines/classic.run_ngram_cv — 10-fold 0.712) as a
    # per-fold teacher, CROSS-FITTED inside each fold's train rows (inner
    # K-fold; the teacher never sees the row it predicts nor any fold-val
    # row), and the train loss becomes (1-λ)·CE(hard) + λ·CE(teacher prob).
    # Eval and emitted TSVs stay purely neural.  0 disables.
    distill_lambda: float = 0.0
    # Sequence-pack the MLM corpus (train/pretrain.py MLMConfig.pack):
    # co-packed texts never attend each other so the objective is
    # unchanged; rows per epoch drop by the corpus padding ratio (~4x at
    # the 64-token MLM length).  mlm batch_size then counts packed rows.
    mlm_pack: bool = False
    # SimCLR image-SSL pretraining (train/pretrain_image.py): when > 0 and
    # no external image checkpoint is given, the 2B/2C drivers first run
    # this many epochs of contrastive pretraining over the train-split
    # pixels (two on-device-augmented views, NT-Xent) and initialize the
    # image backbone from it — the image-branch counterpart of mlm_epochs
    # (meaningful only when real image files exist on disk).
    simclr_epochs: int = 0
    # Optimizer family for the big [vocab, hidden] word-embedding tables
    # (~45% of flagship params, and their gradient support per step is a
    # few thousand rows at most).  "adam" (default) keeps exact torch-Adam
    # semantics; "factored" swaps the tables' optimizer for momentum-free
    # factored-second-moment RMS (optax.scale_by_factored_rms — the
    # Adafactor accumulator): per-table state drops from 2×[V,H] f32 to
    # [V]+[H], cutting the optimizer pass's HBM read-modify-write traffic
    # on an HBM-bound step (see BREAKDOWN.json roofline).  All other
    # params stay on Adam.  "sparse" = lazy row-Adam (train/sparse_opt.py):
    # exact Adam on only the ≤embedding_support_rows vocab rows each step's
    # gradient touches (torch SparseAdam semantics — untouched rows frozen);
    # the optimizer's full-table read-modify-write disappears entirely.
    # All other params stay on Adam.  Neither is bit-parity with the
    # reference — opt-in.
    embedding_optimizer: str = "adam"
    # Static per-step touched-row bound for embedding_optimizer == "sparse".
    # 0 (default) = sized automatically: the drivers pass the realized
    # bucketed batch token bound (batch_size × bucketed seq len per table),
    # falling back to the config cap batch_size × max seq len.  Set > 0 to
    # force a FLOOR on the automatic sizing (an explicit value is never
    # silently dropped).  Rows beyond the bound (smallest gradient norms)
    # are skipped for that step; support_rows only sizes per-step
    # temporaries, so checkpoints are interchangeable across values.
    embedding_support_rows: int = 0
    # Dispatch amortization: fuse this many optimizer steps into ONE jitted
    # lax.scan dispatch (train/step.make_scan_train_step).  Over a remote
    # TPU link each executable launch costs a host round-trip; scanning K
    # steps pays it once per K.  Semantics-preserving: per-step losses,
    # grad norms, eval cadence and log cadence are unchanged (scan groups
    # never straddle an eval boundary — train/loop._scan_group_plan); only
    # the dropout key derivation differs (jax.random.split(key, K) per
    # group vs sequential splits).  1 = one dispatch per step.
    scan_steps: int = 1
