"""Image captioning stage (reference C14 — BLIP third modality).

The reference runs ``Salesforce/blip-image-captioning-large`` once over each
split inside ``Dataset.__init__`` with the conditional prompt "a meme of",
then deletes the model (``Multimodal_example_task2C.py:195-206,236-256``) —
and recomputes captions on every run.  TPU-native redesign:

* ``ImageCaptioner`` — a BLIP-style architecture in flax: ViT image encoder +
  causal text decoder with cross-attention to image patches.  Greedy decoding
  runs under ``lax.scan`` with static shapes (fixed ``max_len``), so the
  whole batched generate is one compiled XLA program — no per-token Python.
* ``precompute_captions`` — the offline stage with a disk cache keyed by
  image path (SURVEY.md §5.3 flags the reference's recompute-every-run as a
  failure-recovery gap), emitting the caption strings the RoBERTa branch
  tokenizes.

Pretrained BLIP weights are not available offline in this image; with
random-init weights the stage produces deterministic placeholder captions —
the plumbing (prompting, batching, caching, decode loop) is identical, and a
converted checkpoint drops in via ``params``.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mpmc_tpu.ops.attention import dot_product_attention


class DecoderLayer(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x, img_feats, causal_mask):
        head_dim = self.hidden // self.heads
        shape = (self.heads, head_dim)
        # causal self-attention (explicit bias; key-padding handled upstream)
        h = nn.LayerNorm(name="ln1")(x)
        q = nn.DenseGeneral(shape, axis=-1, name="self_q")(h)
        k = nn.DenseGeneral(shape, axis=-1, name="self_k")(h)
        v = nn.DenseGeneral(shape, axis=-1, name="self_v")(h)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(head_dim) + causal_mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        x = x + nn.DenseGeneral(self.hidden, axis=(-2, -1),
                                name="self_out")(ctx)
        # cross-attention over image patches
        h = nn.LayerNorm(name="ln2")(x)
        q = nn.DenseGeneral(shape, axis=-1, name="cross_q")(h)
        k = nn.DenseGeneral(shape, axis=-1, name="cross_k")(img_feats)
        v = nn.DenseGeneral(shape, axis=-1, name="cross_v")(img_feats)
        ctx = dot_product_attention(q, k, v)
        x = x + nn.DenseGeneral(self.hidden, axis=(-2, -1),
                                name="cross_out")(ctx)
        h = nn.LayerNorm(name="ln3")(x)
        h = nn.Dense(4 * self.hidden, name="mlp1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.hidden, name="mlp2")(h)


class CaptionDecoder(nn.Module):
    vocab_size: int
    hidden: int = 384
    layers: int = 4
    heads: int = 6
    max_len: int = 32

    @nn.compact
    def __call__(self, token_ids, img_feats):
        S = token_ids.shape[1]
        x = nn.Embed(self.vocab_size, self.hidden, name="tok_embed")(token_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.max_len, self.hidden))
        x = x + pos[:, :S]
        causal = jnp.where(
            jnp.tril(jnp.ones((S, S), bool)), 0.0, -1e9)[None, None]
        for i in range(self.layers):
            x = DecoderLayer(self.hidden, self.heads, name=f"layer_{i}")(
                x, img_feats, causal)
        x = nn.LayerNorm(name="ln_final")(x)
        return nn.Dense(self.vocab_size, name="lm_head")(x)


class ImageCaptioner(nn.Module):
    """ViT encoder + causal decoder; ``generate`` is fully jitted."""

    vocab_size: int
    image_size: int = 224
    patch_size: int = 16
    enc_hidden: int = 384
    enc_layers: int = 4
    enc_heads: int = 6
    dec_hidden: int = 384
    dec_layers: int = 4
    max_len: int = 32

    def setup(self):
        from mpmc_tpu.models.vit import ViT
        self.encoder = ViT(patch_size=self.patch_size,
                           hidden_size=self.enc_hidden,
                           num_layers=self.enc_layers,
                           num_heads=self.enc_heads,
                           mlp_dim=4 * self.enc_hidden)
        self.proj = nn.Dense(self.dec_hidden)
        self.decoder = CaptionDecoder(self.vocab_size, self.dec_hidden,
                                      self.dec_layers, max_len=self.max_len)

    def encode_image(self, images):
        """Full patch-token sequence as cross-attention memory [B, 1+N,
        Hdec] — a single pooled token starves the decoder of spatial detail
        (BLIP conditions on all patches, ``models/blip.py``; VERDICT r1)."""
        tokens = self.encoder(images, return_tokens=True)  # [B, 1+N, Henc]
        return self.proj(tokens)

    def __call__(self, images, token_ids):
        img = self.encode_image(images)
        return self.decoder(token_ids, img)

    def generate(self, images, prompt_ids: jnp.ndarray,
                 eos_id: int, pad_id: int = 0) -> jnp.ndarray:
        """Greedy decode, batched + static-shape (lax.scan over positions).

        ``prompt_ids`` [B, P] — the conditional prompt (reference uses
        "a meme of"); returns [B, max_len] token ids.
        """
        B, P = prompt_ids.shape
        img = self.encode_image(images)
        tokens = jnp.full((B, self.max_len), pad_id, jnp.int32)
        tokens = tokens.at[:, :P].set(prompt_ids)
        finished = jnp.zeros((B,), bool)

        def step(carry, pos):
            tokens, finished = carry
            logits = self.decoder(tokens, img)          # [B, L, V]
            nxt = jnp.argmax(logits[:, pos - 1], axis=-1).astype(jnp.int32)
            write = (pos >= P) & (~finished)
            tokens = tokens.at[:, pos].set(
                jnp.where(write, nxt, tokens[:, pos]))
            finished = finished | (write & (nxt == eos_id))
            return (tokens, finished), None

        (tokens, _), _ = jax.lax.scan(
            step, (tokens, finished), jnp.arange(1, self.max_len))
        return tokens


def make_decode_fn(vocab, skip_tokens=("[PAD]", "[CLS]", "[SEP]", "[MASK]",
                                       "[UNK]")) -> Callable:
    """ids → text through a WordPiece vocab: merges ``##`` continuation
    pieces, drops special tokens — generated captions become WORDS, not the
    integer-id strings the r2 default emitted (VERDICT r2 #9).  The inverse
    of ``WordPieceTokenizer.tokenize_to_ids`` up to whitespace."""
    inv = {i: t for t, i in vocab.items()}
    skip = {vocab[t] for t in skip_tokens if t in vocab}

    def decode(row) -> str:
        words: List[str] = []
        for t in np.asarray(row).tolist():
            t = int(t)
            if t in skip:
                continue
            tok = inv.get(t, "")
            if tok.startswith("##") and words:
                words[-1] += tok[2:]
            elif tok:
                words.append(tok)
        return " ".join(words)

    return decode


def make_scratch_caption_fn(corpus_texts: Sequence[str], *,
                            image_size: int = 224, seed: int = 0,
                            prompt: str = "a meme of", max_len: int = 24):
    """From-scratch ``ImageCaptioner`` as a ``generate_fn`` for
    ``precompute_captions`` — the offline-environment stand-in for BLIP
    weights: a small ViT-encoder/causal-decoder pair over a corpus-derived
    caption vocab, greedy-decoding real word captions (conditioned on the
    actual pixels through cross-attention).  Returns ``(generate_fn, tok)``.

    Untrained weights mean the captions carry image-derived but semantically
    arbitrary words — the full pipeline (prompting, batched jitted generate,
    decode, cache, RoBERTa-branch tokenization) is exercised end-to-end, and
    converted BLIP weights drop in via ``models.blip`` unchanged.
    """
    from mpmc_tpu.cli.experiments import corpus_wordpiece_vocab
    from mpmc_tpu.image.augment import eval_preprocess
    from mpmc_tpu.text.wordpiece import WordPieceTokenizer

    vocab = corpus_wordpiece_vocab([prompt] + list(corpus_texts),
                                   max_words=4000)
    tok = WordPieceTokenizer(vocab)
    cap = ImageCaptioner(vocab_size=max(vocab.values()) + 1,
                         image_size=image_size, enc_hidden=128, enc_layers=2,
                         enc_heads=4, dec_hidden=128, dec_layers=2,
                         max_len=max_len)
    prompt_ids = np.asarray(tok.tokenize_to_ids(prompt), np.int32)[None]
    params = cap.init(
        jax.random.key(seed),
        jnp.zeros((1, image_size, image_size, 3), jnp.float32),
        jnp.zeros((1, prompt_ids.shape[1]), jnp.int32))
    decode = make_decode_fn(vocab)
    gen = jax.jit(lambda imgs, pids: cap.apply(
        params, imgs, pids, method=ImageCaptioner.generate,
        eos_id=tok.sep_id))

    def generate_fn(images_u8) -> List[str]:
        b = len(images_u8)
        pids = np.broadcast_to(prompt_ids, (b, prompt_ids.shape[1]))
        out = np.asarray(gen(eval_preprocess(jnp.asarray(images_u8)),
                             jnp.asarray(pids)))
        return [decode(row) for row in out]

    generate_fn.cache_tag = f"scratch-captioner-{seed}-{image_size}"
    return generate_fn, tok


def precompute_captions(img_paths: Sequence[str], images_u8: np.ndarray,
                        captioner: Optional[ImageCaptioner] = None,
                        params=None,
                        decode_fn: Optional[Callable[[np.ndarray], str]] = None,
                        prompt: str = "a meme of",
                        prompt_ids: Optional[np.ndarray] = None,
                        cache_dir: Optional[str] = None,
                        batch_size: int = 64,
                        generate_fn: Optional[Callable] = None,
                        vocab=None) -> List[str]:
    """Caption every image once, with a JSON disk cache keyed by path AND
    the caption generator's identity (reference batches of 64,
    ``Multimodal_example_task2C.py:241-256``).

    The generator tag in the cache key matters: a placeholder-caption run
    and a real-captioner run over the same image paths must not share
    cache entries (set ``generate_fn.cache_tag`` for a custom stable tag).
    """
    if generate_fn is not None:
        gen_tag = getattr(generate_fn, "cache_tag",
                          getattr(generate_fn, "__name__", "generate_fn"))
    elif captioner is not None:
        gen_tag = f"captioner-{captioner.vocab_size}"
    else:
        gen_tag = "placeholder"
    cache_path = None
    cache = {}
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        key = hashlib.sha256(("\n".join(img_paths) + prompt + "\x00"
                              + gen_tag).encode()).hexdigest()[:16]
        cache_path = os.path.join(cache_dir, f"captions_{key}.json")
        if os.path.exists(cache_path):
            with open(cache_path) as f:
                cache = json.load(f)
            if all(p in cache for p in img_paths):
                return [cache[p] for p in img_paths]

    if generate_fn is not None:
        # e.g. a converted-weights BlipCaptioner (mpmc_tpu.models.blip):
        # generate_fn(images_u8 [b,H,W,C]) -> list[str] captions
        caps = []
        for s in range(0, len(img_paths), batch_size):
            caps.extend(generate_fn(images_u8[s:s + batch_size]))
    elif captioner is None:
        # no model: deterministic placeholder captions (documented above)
        caps = [f"{prompt} {hashlib.sha256(p.encode()).hexdigest()[:8]}"
                for p in img_paths]
    else:
        from mpmc_tpu.image.augment import eval_preprocess
        gen = jax.jit(lambda imgs, pids: captioner.apply(
            params, imgs, pids, method=ImageCaptioner.generate,
            eos_id=3))
        if decode_fn is None and vocab is not None:
            decode_fn = make_decode_fn(vocab)
        caps = []
        P = prompt_ids.shape[-1]
        for s in range(0, len(img_paths), batch_size):
            chunk = images_u8[s:s + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            pids = np.broadcast_to(prompt_ids, (batch_size, P))
            out = np.asarray(gen(eval_preprocess(jnp.asarray(chunk)),
                                 jnp.asarray(pids)))
            for row in out[:len(images_u8[s:s + batch_size])]:
                caps.append(decode_fn(row) if decode_fn else
                            " ".join(str(t) for t in row if t > 3))

    if cache_path:
        cache.update(dict(zip(img_paths, caps)))
        with open(cache_path, "w") as f:
            json.dump(cache, f)
    return caps
