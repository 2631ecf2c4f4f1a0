"""Pretrained-checkpoint loading: splice converted torch weights into
initialized flax variable trees.

The reference pulls every encoder from the HF hub / timm at run time
(``Multimodal_example_task2C.py:317`` AraBERT, ``:83,567`` timm resnet;
``extract_feat.py:84-92`` convnext+AraBERT).  Offline here: a local torch
checkpoint (HF-layout for BERT-family text encoders, torchvision/timm/HF
layout for image backbones — ``models.hf_convert`` / ``models.
vision_convert``) is converted to our param tree and *spliced* into the
model's initialized variables at the stable submodule paths:

* ``TextClassifier``         → ``params/encoder``
* ``ImageClassifier``        → ``params/backbone`` (+ batch_stats)
* ``ImageEncoderWithHead``   → inside MultimodalClassifier at
  ``params/image_model/backbone``
* ``MultimodalClassifier``   → ``params/text_model``,
  ``params/caption_text_model``, ``params/image_model/backbone``

Every splice validates leaf-set and shape equality against the initialized
subtree, so an arch/checkpoint mismatch fails loudly instead of training a
silently half-random model.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from mpmc_tpu.config import ModelConfig


@dataclasses.dataclass(frozen=True)
class PretrainedSpec:
    """Paths to local torch checkpoints (file or HF checkpoint dir)."""

    text: Optional[str] = None      # BERT-family (AraBERT/QARiB/DistilBERT…)
    caption: Optional[str] = None   # BERT-family (RoBERTa caption branch)
    image: Optional[str] = None     # torchvision/timm/HF vision backbone

    def __bool__(self) -> bool:
        return bool(self.text or self.caption or self.image)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Torch state dict as numpy from a file (.safetensors/.bin/.pt/.npz)
    or an HF checkpoint directory."""
    if os.path.isdir(path):
        from mpmc_tpu.models.hf_convert import load_hf_checkpoint
        return load_hf_checkpoint(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v) for k, v in sd.items()}


def _tree_spec(tree) -> Dict[Tuple, Tuple]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = tuple(str(getattr(k, "key", k)) for k in path)
        out[key] = tuple(np.shape(leaf))
    return out


def _validate(dst, src, where: str) -> None:
    d, s = _tree_spec(dst), _tree_spec(src)
    if d.keys() != s.keys():
        missing = sorted(d.keys() - s.keys())[:5]
        extra = sorted(s.keys() - d.keys())[:5]
        raise ValueError(
            f"pretrained splice at {where!r}: leaf sets differ "
            f"(missing from checkpoint: {missing}; unexpected: {extra})")
    for k in d:
        if d[k] != s[k]:
            raise ValueError(
                f"pretrained splice at {where!r}: shape mismatch at "
                f"{'/'.join(k)}: model {d[k]} vs checkpoint {s[k]}")


def _splice(variables: Dict, col: str, path: Tuple[str, ...], new) -> Dict:
    """Functionally replace ``variables[col][path...]`` with ``new``."""
    def rec(node, parts):
        node = dict(node)
        if len(parts) == 1:
            _validate(node[parts[0]], new, "/".join((col,) + path))
            node[parts[0]] = new
        else:
            node[parts[0]] = rec(node[parts[0]], parts[1:])
        return node

    variables = dict(variables)
    variables[col] = rec(variables[col], path)
    return variables


def _convert_text(path: str, text_cfg, dst: Dict) -> Dict:
    """Convert a BERT-family checkpoint; keep the model's initialized
    pooler/token-type tables when the checkpoint ships without them (some
    RoBERTa dumps drop the unused pooler).

    Flax-tree npz files written by ``train.pretrain.save_encoder_params``
    (corpus MLM pretraining) are recognized by their marker entry and
    spliced directly — no torch-layout conversion involved."""
    from mpmc_tpu.models.hf_convert import convert_bert_state_dict
    sd = load_state_dict(path)
    if "__flax_encoder__" in sd:
        from mpmc_tpu.train.pretrain import unflatten_params
        conv = unflatten_params(sd)
    else:
        conv = convert_bert_state_dict(sd, text_cfg)
    for key in ("pooler", "token_type_embeddings"):
        if key in dst and key not in conv:
            conv[key] = dst[key]
    return conv


def infer_text_config_from_tree(tree: Dict) -> "TextEncoderConfig":
    """Recover a ``TextEncoderConfig`` from a flax encoder param tree's
    array shapes (corpus-MLM npz checkpoints carry no config sidecar):
    vocab/hidden from the embedding table, heads/head-dim from the fused
    attention kernels, layer count from the ``layer_i`` groups."""
    from mpmc_tpu.config import TextEncoderConfig
    vocab, hidden = tree["word_embeddings"]["embedding"].shape
    max_pos = tree["position_embeddings"]["embedding"].shape[0]
    type_vocab = tree["token_type_embeddings"]["embedding"].shape[0]
    heads = tree["layer_0"]["attention"]["query"]["kernel"].shape[1]
    inter = tree["layer_0"]["intermediate"]["kernel"].shape[1]
    layers = sum(1 for k in tree if k.startswith("layer_"))
    return TextEncoderConfig(vocab_size=vocab, hidden_size=hidden,
                             num_layers=layers, num_heads=heads,
                             intermediate_size=inter,
                             max_position_embeddings=max_pos,
                             type_vocab_size=type_vocab)


def _convert_image(path: str, arch: str, num_classes: int = 0) -> Dict:
    """Convert an image-backbone checkpoint to ``{"params": tree,
    "batch_stats": tree}``.

    Flax-tree npz files written by
    ``train.pretrain_image.save_image_encoder_params`` (SimCLR corpus
    pretraining) are recognized by their marker entry and spliced directly;
    anything else goes through the torch-layout vision converter."""
    from mpmc_tpu.models.vision_convert import convert_image_state_dict
    sd = load_state_dict(path)
    if "__flax_image_encoder__" in sd:
        from mpmc_tpu.train.pretrain import unflatten_params
        tree = unflatten_params(
            {k: v for k, v in sd.items() if k != "__flax_image_encoder__"})
        return {"params": tree.get("params", {}),
                "batch_stats": tree.get("batch_stats", {})}
    kw = {"num_classes": num_classes} if num_classes else {}
    return convert_image_state_dict(sd, arch, **kw)


def apply_pretrained(variables: Dict, mcfg: ModelConfig, kind: str,
                     spec: Optional[PretrainedSpec]) -> Dict:
    """Splice the converted checkpoints of ``spec`` into ``variables``.

    ``kind`` is the experiment-driver model kind: ``text`` (TextClassifier),
    ``image`` (ImageClassifier), ``multimodal`` (MultimodalClassifier).
    """
    if not spec:
        return variables

    if kind == "text":
        if spec.image or spec.caption:
            raise ValueError("text model takes only spec.text")
        if spec.text:
            variables = _splice(
                variables, "params", ("encoder",),
                _convert_text(spec.text, mcfg.text,
                              variables["params"]["encoder"]))
        return variables

    if kind == "image":
        if spec.text or spec.caption:
            raise ValueError("image model takes only spec.image")
        if spec.image:
            conv = _convert_image(spec.image, mcfg.image.arch)
            variables = _splice(variables, "params", ("backbone",),
                                conv["params"])
            if conv["batch_stats"]:
                variables = _splice(variables, "batch_stats", ("backbone",),
                                    conv["batch_stats"])
        return variables

    if kind == "simple":
        # SimpleMultimodalClassifier (C28): text_model + 1000-logit backbone
        if spec.caption:
            raise ValueError("simple 2C model has no caption branch")
        if spec.text:
            variables = _splice(
                variables, "params", ("text_model",),
                _convert_text(spec.text, mcfg.text,
                              variables["params"]["text_model"]))
        if spec.image:
            bb = variables["params"]["backbone"]
            n_cls = (bb["classifier"]["bias"].shape[0]
                     if "classifier" in bb else 0)
            conv = _convert_image(spec.image, mcfg.image.arch,
                                  num_classes=n_cls)
            variables = _splice(variables, "params", ("backbone",),
                                conv["params"])
            if conv["batch_stats"]:
                variables = _splice(variables, "batch_stats", ("backbone",),
                                    conv["batch_stats"])
        return variables

    if kind == "multimodal":
        if spec.text:
            variables = _splice(
                variables, "params", ("text_model",),
                _convert_text(spec.text, mcfg.text,
                              variables["params"]["text_model"]))
        if spec.caption:
            variables = _splice(
                variables, "params", ("caption_text_model",),
                _convert_text(spec.caption, mcfg.caption,
                              variables["params"]["caption_text_model"]))
        if spec.image:
            conv = _convert_image(spec.image, mcfg.image.arch)
            variables = _splice(variables, "params",
                                ("image_model", "backbone"), conv["params"])
            if conv["batch_stats"]:
                variables = _splice(variables, "batch_stats",
                                    ("image_model", "backbone"),
                                    conv["batch_stats"])
        return variables

    raise ValueError(f"unknown model kind {kind!r}")
