"""Frozen-encoder feature extraction (reference C4 — ``baselines/extract_feat.py``).

Extracts 768-d image features (ConvNeXt-Tiny, pooled — the torchvision
``avgpool(features(img))`` equivalent, ``extract_feat.py:84-87,57-60``) and
768-d text features (BERT pooler output over Arabic-normalized text,
``extract_feat.py:90-92``) for every sample of a split, and dumps the same
JSON schema the downstream SVM baselines read:
``{"imgfeats": {id: [768 floats]}, "textfeats": {id: [768 floats]}}``
(``extract_feat.py:110``).

TPU-native: one jitted batched forward per modality (batch 32 like the
reference's loader, ``extract_feat.py:47``), images decoded by the host
pipeline.  Without converted pretrained weights the encoders are random-init
(documented: this image has no network access); the stage, schema, and SVM
plumbing are identical either way, and converted checkpoints drop in via
``--text-params`` / ``--image-params`` msgpack files.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from mpmc_tpu.config import TextEncoderConfig
from mpmc_tpu.io.manifest import read_manifest


def extract_features(data_dir: str, file_name: str, out_file_name: str,
                     image_root: Optional[str] = None,
                     batch_size: int = 32,
                     text_vocab_path: Optional[str] = None,
                     text_params_path: Optional[str] = None,
                     image_params_path: Optional[str] = None,
                     features_dir: Optional[str] = None) -> str:
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from mpmc_tpu.image.augment import eval_preprocess
    from mpmc_tpu.image.pipeline import ImagePipeline
    from mpmc_tpu.models.bert import TextEncoder
    from mpmc_tpu.models.convnext import convnext_tiny
    from mpmc_tpu.text.normalize import preprocess_arabic_tweet
    from mpmc_tpu.text.wordpiece import WordPieceTokenizer

    manifest = read_manifest(os.path.join(data_dir, file_name))
    n = len(manifest)

    # ---- text config / vocab resolution (before any heavy work so bad
    # --text-params/--text-vocab combinations fail fast) ----
    cfg = TextEncoderConfig.arabertv2()
    texts = [preprocess_arabic_tweet(t) for t in manifest.texts]

    # Corpus-MLM flax-npz encoders (train/pretrain.save_encoder_params):
    # infer the architecture from the tree shapes and splice directly —
    # this is the offline-real-weights path for the README feature-SVM
    # rows (extract_feat.py:90-92 loads downloaded AraBERTv2 instead).
    mlm_tree = None
    if text_params_path and text_params_path.endswith(".npz"):
        from mpmc_tpu.models.pretrained import (infer_text_config_from_tree,
                                                load_state_dict)
        sd = load_state_dict(text_params_path)
        if "__flax_encoder__" in sd:
            from mpmc_tpu.train.pretrain import unflatten_params
            mlm_tree = unflatten_params(sd)
            cfg = infer_text_config_from_tree(mlm_tree)
            if not text_vocab_path:
                raise ValueError(
                    "a corpus-MLM npz encoder needs its matching vocab "
                    "file (the vocab.txt persisted next to it) via "
                    "text_vocab_path — the inline corpus vocab would "
                    "assign different token ids")
    if text_vocab_path:
        tok = WordPieceTokenizer.from_file(text_vocab_path)
        vocab_size = max(tok.vocab.values()) + 1
        if mlm_tree is not None:
            if vocab_size != cfg.vocab_size:
                raise ValueError(
                    f"vocab file has {vocab_size} ids but the MLM encoder "
                    f"was trained with {cfg.vocab_size} — wrong vocab.txt?")
        else:
            cfg = TextEncoderConfig(vocab_size=vocab_size)
    else:
        # corpus-derived vocab (no pretrained vocab file available offline)
        words: Dict[str, int] = {}
        for t in texts:
            for w in t.split():
                words[w] = words.get(w, 0) + 1
        top = sorted(words, key=words.get, reverse=True)[:30000]
        chars = sorted({c for w in top for c in w})
        vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + top
                 + ["##" + c for c in chars] + chars)
        tok = WordPieceTokenizer({t: i for i, t in enumerate(vocab)})
        cfg = TextEncoderConfig(vocab_size=len(vocab))
    ids, mask = tok.encode_batch(texts, 128)

    # ---- image branch ----
    net = convnext_tiny()
    pipe = ImagePipeline(manifest.img_paths, root=image_root or data_dir,
                         size=224)
    images = pipe.preload()
    img_vars = net.init(jax.random.key(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))
    if image_params_path:
        if image_params_path.endswith(".msgpack"):
            with open(image_params_path, "rb") as f:
                img_vars = serialization.from_bytes(img_vars, f.read())
        else:  # torchvision/HF ConvNeXt-Tiny checkpoint → converter
            from mpmc_tpu.models.pretrained import load_state_dict
            from mpmc_tpu.models.vision_convert import \
                convert_convnext_state_dict
            img_vars = {"params": convert_convnext_state_dict(
                load_state_dict(image_params_path))["params"]}

    # params as jit *arguments* (a closure would bake ~100MB of weights into
    # the HLO as constants — oversized compile payloads, slower compiles)
    @jax.jit
    def img_fwd(variables, u8):
        return net.apply(variables, eval_preprocess(u8))

    img_feats = []
    for s in range(0, n, batch_size):
        chunk = images[s:s + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                    chunk.dtype)])
        out = np.asarray(img_fwd(img_vars, jnp.asarray(chunk)))
        img_feats.append(out[:batch_size - pad or batch_size])
    img_feats = np.concatenate(img_feats)[:n]

    # ---- text branch ----
    enc = TextEncoder(cfg)
    txt_vars = enc.init(jax.random.key(1), ids[:1], mask[:1])
    if text_params_path:
        if mlm_tree is not None:
            from mpmc_tpu.models.pretrained import _validate
            _validate(txt_vars["params"], mlm_tree, "params")
            txt_vars = {"params": mlm_tree}
        elif text_params_path.endswith(".msgpack"):
            with open(text_params_path, "rb") as f:
                txt_vars = serialization.from_bytes(txt_vars, f.read())
        else:  # HF AraBERTv2 checkpoint (dir/bin/safetensors) → converter
            from mpmc_tpu.models.hf_convert import convert_bert_state_dict
            from mpmc_tpu.models.pretrained import load_state_dict
            txt_vars = {"params": convert_bert_state_dict(
                load_state_dict(text_params_path), cfg)}

    @jax.jit
    def txt_fwd(variables, i, m):
        _, pooled = enc.apply(variables, i, m, return_pooled=True)
        return pooled

    txt_feats = []
    for s in range(0, n, batch_size):
        i, m = ids[s:s + batch_size], mask[s:s + batch_size]
        pad = batch_size - len(i)
        if pad:
            i = np.concatenate([i, np.zeros((pad, i.shape[1]), i.dtype)])
            m = np.concatenate([m, np.zeros((pad, m.shape[1]), m.dtype)])
        out = np.asarray(txt_fwd(txt_vars, jnp.asarray(i), jnp.asarray(m)))
        txt_feats.append(out[:batch_size - pad or batch_size])
    txt_feats = np.concatenate(txt_feats)[:n]

    out_dir = features_dir or os.path.join(data_dir, "features")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, out_file_name)
    with open(out_path, "w") as f:
        json.dump({
            "imgfeats": {i: v.tolist() for i, v in zip(manifest.ids, img_feats)},
            "textfeats": {i: v.tolist() for i, v in zip(manifest.ids, txt_feats)},
        }, f)
    return out_path
