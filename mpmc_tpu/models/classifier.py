"""Classifier assemblies for subtasks 2A/2B/2C (reference C16, C21, C22).

* ``TextClassifier`` — 2A: BERT encoder → pooling (any of the six modes) →
  linear head (reference ``LLMWithClassificationHead`` classifier variant,
  ``textmodel_example_task2A.py:291-383``).
* ``ImageEncoderWithHead`` — the ``CustomDenseNet161`` wrapper (a misnomer in
  the reference — it wraps any timm backbone, ``Multimodal_example_task2C.py:
  562-585``): backbone features → Linear→ReLU→Dropout(0.35)→Linear.
* ``ImageClassifier`` — 2B: backbone → (plain linear | BinaryHead) head
  (``Untitled-2.py`` zoo wrappers).
* ``MultimodalClassifier`` — 2C flagship (``Multimodal_example_task2C.py:
  587-685``): AraBERT cls→Dropout(.3)→FC(768→512)+BN+ReLU; RoBERTa caption
  branch likewise; image branch; fusion module; output Linear(512→1)+BN →
  single logit.
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn

from mpmc_tpu.config import ImageEncoderConfig, ModelConfig, PoolingType
from mpmc_tpu.models.bert import TextEncoder
from mpmc_tpu.ops.packing import packed_sample_view, unpack_cls
from mpmc_tpu.models.convnext import ConvNeXt
from mpmc_tpu.models.efficientnet import EfficientNet
from mpmc_tpu.models.fusion import make_fusion
from mpmc_tpu.models.pooling import Pooler
from mpmc_tpu.models.resnet import ResNet, TinyResNet
from mpmc_tpu.models.vit import BinaryHead, ViT


def create_image_backbone(cfg: ImageEncoderConfig,
                          name: Optional[str] = None,
                          num_classes: int = 0) -> nn.Module:
    """timm-style factory (the reference's ``GeneralizedMemesClassifier``
    generic-backbone pattern, ``Untitled-2.py:346-359``).

    ``name`` pins the flax submodule name (stable param paths for pretrained
    checkpoint splicing, ``models.pretrained``); ``num_classes`` > 0 keeps
    the classifier head (e.g. the organizer 2C baseline consumes resnet50's
    raw 1000-class logits, ``Multimodal_example_task2C.txt:164-165``)."""
    a = cfg.arch
    kw = {"name": name} if name else {}
    if num_classes:
        kw["num_classes"] = num_classes
    if a == "resnet18":
        return ResNet((2, 2, 2, 2), (64, 128, 256, 512), "basic", **kw)
    if a == "resnet50":
        return ResNet((3, 4, 6, 3), (64, 128, 256, 512), "bottleneck", **kw)
    if a == "resnext50_32x4d":
        return ResNet((3, 4, 6, 3), (64, 128, 256, 512), "bottleneck",
                      groups=32, base_width=4, **kw)
    if a == "seresnext50_32x4d":
        return ResNet((3, 4, 6, 3), (64, 128, 256, 512), "bottleneck",
                      groups=32, base_width=4, use_se=True, **kw)
    if a == "tiny_resnet":
        return TinyResNet(**kw)
    if a in ("vit_base_16", "vit_base_patch16_224", "vit_base_patch16_384"):
        return ViT(**kw)
    if a in ("vit_base_32", "clip_vit_b32"):
        # CLIP-style ViT-B/32 trunk (the working version of the reference's
        # abandoned CLIP 2C attempt, mm_model_mm_example_task2C.py:49 — C26)
        return ViT(patch_size=32, **kw)
    if a in ("vit_large_16", "vit_large_patch16_384"):
        return ViT(hidden_size=1024, num_layers=24, num_heads=16,
                   mlp_dim=4096, **kw)
    if a == "convnext_tiny":
        return ConvNeXt(**kw)
    if a in ("efficientnet_b0", "efficientnet_b1", "efficientnet_b2",
             "efficientnet_b3", "efficientnet_b4"):
        return EfficientNet(a[-2:], **kw)
    raise ValueError(f"Unknown image arch: {a}")


class ImageEncoderWithHead(nn.Module):
    """Backbone + fine-tune MLP (reference CustomDenseNet161, :562-585)."""

    cfg: ImageEncoderConfig

    @nn.compact
    def __call__(self, image, train: bool = False):
        feats = create_image_backbone(self.cfg, name="backbone")(
            image, train=train)
        h = nn.Dense(self.cfg.finetune_dim, name="finetune_fc1")(feats)
        h = nn.relu(h)
        h = nn.Dropout(self.cfg.finetune_dropout)(h, deterministic=not train)
        return nn.Dense(self.cfg.finetune_dim, name="finetune_fc2")(h)


class TextClassifier(nn.Module):
    """2A text-only classifier: encoder → pooler → linear head."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, train: bool = False):
        hidden = TextEncoder(self.cfg.text, name="encoder")(
            input_ids, attention_mask, deterministic=not train)
        pooled = Pooler(self.cfg.pooling, self.cfg.text.hidden_size,
                        name="pooler")(hidden, attention_mask)
        return nn.Dense(self.cfg.num_classes, name="output")(pooled)


class PackedTextClassifier(nn.Module):
    """``TextClassifier`` over a PACKED batch (``ops/packing.py``): several
    samples per transformer row with segment-masked attention and restarting
    position ids — per-sample numerics are exactly the unpacked forward's
    (parity-tested), at ~padding-ratio× fewer transformer rows (the corpus
    averages ~15 tokens vs the 128-token bucket).

    The parameter tree is identical to ``TextClassifier`` (``encoder``,
    ``pooler``, ``output``) so checkpoints are interchangeable.  Unmasked
    poolings (MAX/CNN/NOPOOLING) cannot be packed (neighbouring samples
    would leak through the unmasked reduction) and are rejected.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, packed, train: bool = False):
        c = self.cfg
        p = PoolingType(c.pooling)
        if p in (PoolingType.MAX, PoolingType.CNN, PoolingType.NOPOOLING):
            raise ValueError(f"pooling {p.value} is unmasked and cannot be "
                             "packed (ops/packing.py)")
        segments = packed["segments"]
        hidden = TextEncoder(c.text, name="encoder")(
            packed["ids"], (segments > 0).astype(jax.numpy.int32),
            deterministic=not train, segments=segments,
            positions=packed["positions"])
        if p == PoolingType.CLS:
            pooled = unpack_cls(hidden, packed)
        else:
            rows, mask = packed_sample_view(hidden, packed)
            pooled = Pooler(c.pooling, c.text.hidden_size,
                            name="pooler")(rows, mask)
        return nn.Dense(c.num_classes, name="output")(pooled)


class ImageClassifier(nn.Module):
    """2B image-only classifier; ``binary_head=True`` gives the zoo's
    l2-norm + scaled-linear head (``Untitled-2.py:164-179``)."""

    cfg: ModelConfig
    binary_head: bool = False

    @nn.compact
    def __call__(self, image, train: bool = False):
        feats = create_image_backbone(self.cfg.image, name="backbone")(
            image, train=train)
        if self.binary_head:
            return BinaryHead(self.cfg.num_classes, name="binary_head")(feats)
        return nn.Dense(self.cfg.num_classes, name="output")(feats)


class SimpleMultimodalClassifier(nn.Module):
    """C28 — the organizers' simple 2C baseline
    (``Multimodal_example_task2C.txt:152-197``): text encoder →
    ``[0][:, -1, :]`` pooling (the reference takes the LAST token, not CLS —
    a documented reference bug, reproduced for parity behind
    ``last_token_pooling``) → Dropout(0.3) → Linear 768→512; torchvision
    ``resnet50`` *1000-class logits* → Linear 1000→512; concat → Linear
    1024→512 → Linear 512→num_classes.  No activations between the linears
    (faithful to the reference).  Eval transform is Resize/CenterCrop with
    no augmentation — the driver runs the no-train-aug path."""

    cfg: ModelConfig
    last_token_pooling: bool = True   # the reference's [:, -1, :]
    image_logits_dim: int = 1000      # torchvision resnet50 head

    @nn.compact
    def __call__(self, text_ids, text_mask, image, train: bool = False):
        c = self.cfg
        hidden = TextEncoder(c.text, name="text_model")(
            text_ids, text_mask, deterministic=not train)
        pooled = hidden[:, -1] if self.last_token_pooling else hidden[:, 0]
        t = nn.Dropout(0.3)(pooled, deterministic=not train)
        t = nn.Dense(c.proj_dim, name="bert_fc")(t)

        img_logits = create_image_backbone(
            c.image, name="backbone", num_classes=self.image_logits_dim)(
            image, train=train)
        i = nn.Dense(c.proj_dim, name="resnet_fc")(img_logits)

        f = nn.Dense(c.proj_dim, name="fusion_fc")(
            jax.numpy.concatenate([t, i], axis=-1))
        return nn.Dense(c.num_classes, name="output_fc")(f)


class _ModalityFC(nn.Module):
    """Dropout → Linear(H→proj) → BatchNorm → ReLU (per-modality projection,
    reference :591-600)."""

    proj_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(self.proj_dim, name="fc")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class MultimodalClassifier(nn.Module):
    """2C flagship: text + image (+ caption) → fusion → single logit."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, text_ids, text_mask, image,
                 caption_ids: Optional[jax.Array] = None,
                 caption_mask: Optional[jax.Array] = None,
                 train: bool = False):
        c = self.cfg
        feats = []
        # Text branch is optional (cfg.text=None): the image+caption variant
        # the reference intended in imagemodel_example_task2B.py but left
        # broken (NameError on the missing text_model global, :576 — C23).
        if c.text is not None and text_ids is not None:
            hidden = TextEncoder(c.text, name="text_model")(
                text_ids, text_mask, deterministic=not train)
            feats.append(_ModalityFC(c.proj_dim, c.dropout, name="text_fc")(
                hidden[:, 0], train))  # cls pooling (reference :590)

        image_feat = ImageEncoderWithHead(c.image, name="image_model")(
            image, train=train)
        feats.append(image_feat)

        use_caption = c.caption is not None and caption_ids is not None
        if use_caption:
            cap_hidden = TextEncoder(c.caption, name="caption_text_model")(
                caption_ids, caption_mask, deterministic=not train)
            cap_feat = _ModalityFC(c.proj_dim, c.dropout,
                                   name="caption_text_fc")(
                cap_hidden[:, 0], train)
            feats.append(cap_feat)

        fusion = make_fusion(c.fusion, c.proj_dim, len(feats),
                             feat_dims=[f.shape[-1] for f in feats])
        fused = fusion(*feats, train=train)

        logit = nn.Dense(1, name="output_fc")(fused)
        logit = nn.BatchNorm(use_running_average=not train,
                             name="output_bn")(logit)
        return logit[:, 0]  # squeeze to [B] (reference :684)


class PackedMultimodalClassifier(nn.Module):
    """``MultimodalClassifier`` with PACKED text and caption branches
    (``ops/packing.py``): both text towers run several samples per row under
    segment-masked attention (the corpus averages ~15 text / short caption
    tokens vs the 128/64 buckets), the image branch is per-sample as before,
    and each branch's CLS features are gathered back to sample order before
    the modality FCs — so fusion/BatchNorm/head see exactly the unpacked
    batch.  Parameter tree identical to ``MultimodalClassifier``
    (checkpoints interchangeable); per-sample numerics exactly equal
    (parity-tested).

    ``text_packed`` / ``caption_packed`` are ``PackedBatch.asdict()`` trees
    whose per-sample maps are aligned with ``image``'s batch axis.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, text_packed, image, caption_packed=None,
                 train: bool = False):
        c = self.cfg
        feats = []
        if c.text is not None and text_packed is not None:
            seg = text_packed["segments"]
            hidden = TextEncoder(c.text, name="text_model")(
                text_packed["ids"], (seg > 0).astype(jax.numpy.int32),
                deterministic=not train, segments=seg,
                positions=text_packed["positions"])
            cls = unpack_cls(hidden, text_packed)  # reference cls-pool :590
            feats.append(_ModalityFC(c.proj_dim, c.dropout, name="text_fc")(
                cls, train))

        image_feat = ImageEncoderWithHead(c.image, name="image_model")(
            image, train=train)
        feats.append(image_feat)

        use_caption = c.caption is not None and caption_packed is not None
        if use_caption:
            cseg = caption_packed["segments"]
            cap_hidden = TextEncoder(c.caption, name="caption_text_model")(
                caption_packed["ids"], (cseg > 0).astype(jax.numpy.int32),
                deterministic=not train, segments=cseg,
                positions=caption_packed["positions"])
            cap_cls = unpack_cls(cap_hidden, caption_packed)
            feats.append(_ModalityFC(c.proj_dim, c.dropout,
                                     name="caption_text_fc")(cap_cls, train))

        fusion = make_fusion(c.fusion, c.proj_dim, len(feats),
                             feat_dims=[f.shape[-1] for f in feats])
        fused = fusion(*feats, train=train)

        logit = nn.Dense(1, name="output_fc")(fused)
        logit = nn.BatchNorm(use_running_average=not train,
                             name="output_bn")(logit)
        return logit[:, 0]
