"""Self-supervised MLM pretraining over the task corpus.

The reference's entire quality edge comes from large *pretrained* Arabic
encoders — QARiB / AraBERTv2 fine-tunes (``textmodel_example_task2A.py:
41-44``, ``Multimodal_example_task2C.py:317``).  This environment has no
network access, so the rebuilt framework's encoders start cold; converted
checkpoints are supported (``models/vision_convert.py``, ``hf_convert.py``)
but no weights exist on disk.  This stage attacks the quality gap WITHOUT
external weights (VERDICT r2 next-round #2): BERT-style masked-language-model
pretraining (dynamic masking, 80/10/10 corruption) over the train+dev meme
OCR text, with OCR-style character-noise augmentation to stretch the ~2.4k
texts, run before supervised fine-tuning.  The resulting encoder params are
saved as a flax-tree ``.npz`` that the standard ``PretrainedSpec.text``
splice path consumes, so every driver (2A text, 2C text branch) can start
from them via ``--text-params``/``cfg.mlm_epochs``.

All compute is a single jitted scan-fused train step (the same dispatch
amortization as the supervised loop — K optimizer steps per launch).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mpmc_tpu.config import TextEncoderConfig

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Corpus augmentation (host side)
# ---------------------------------------------------------------------------

def char_noise(texts: Sequence[str], rng: np.random.Generator,
               copies: int = 3, word_prob: float = 0.15) -> List[str]:
    """OCR-style character-noise copies of the corpus: per word, with
    ``word_prob``, randomly delete / duplicate / swap-adjacent one character
    — the noise class meme OCR actually exhibits.  Returns the original
    texts followed by ``copies`` noisy variants of each."""
    def noisy_word(w: str) -> str:
        if len(w) < 2:
            return w
        op = rng.integers(3)
        i = int(rng.integers(len(w)))
        if op == 0:                       # delete
            return w[:i] + w[i + 1:]
        if op == 1:                       # duplicate
            return w[:i] + w[i] + w[i:]
        j = min(i + 1, len(w) - 1)        # swap adjacent
        return w[:i] + w[j] + w[i] + w[j + 1:]

    out = list(texts)
    for _ in range(copies):
        for t in texts:
            words = [noisy_word(w) if rng.random() < word_prob else w
                     for w in t.split()]
            out.append(" ".join(words))
    return out


# ---------------------------------------------------------------------------
# Model: shared TextEncoder + MLM head
# ---------------------------------------------------------------------------


def _build_mlm_model(cfg: TextEncoderConfig):
    import flax.linen as nn
    import jax.numpy as jnp

    from mpmc_tpu.models.bert import TextEncoder

    class MLMModel(nn.Module):
        """Encoder (submodule name ``encoder`` — the exact subtree the
        classifier splice consumes) + BERT MLM transform/decoder head.
        ``segments``/``positions`` enable sequence-packed rows
        (ops/packing.py): co-packed texts never attend each other, so
        packed MLM is numerically the same objective at ~padding-ratio×
        fewer rows."""
        cfg: TextEncoderConfig

        @nn.compact
        def __call__(self, ids, mask, train: bool = False, segments=None,
                     positions=None):
            c = self.cfg
            x = TextEncoder(c, name="encoder")(ids, mask,
                                               deterministic=not train,
                                               segments=segments,
                                               positions=positions)
            h = nn.Dense(c.hidden_size, name="mlm_transform")(x)
            h = nn.gelu(h, approximate=c.gelu_approx)
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="mlm_ln")(h)
            return nn.Dense(c.vocab_size, name="mlm_decoder")(h)

    return MLMModel(cfg)


# ---------------------------------------------------------------------------
# Flax-tree npz round-trip (PretrainedSpec.text splice format)
# ---------------------------------------------------------------------------

FLAX_MARKER = "__flax_encoder__"


def flatten_params(tree) -> Dict[str, np.ndarray]:
    import jax
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        out[key] = np.asarray(leaf)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, leaf in flat.items():
        if key == FLAX_MARKER:
            continue
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(leaf)
    return tree


def save_encoder_params(encoder_params, path: str) -> None:
    """Save an encoder param subtree as a flax-tree npz that
    ``models.pretrained._convert_text`` recognizes (the ``FLAX_MARKER``
    entry routes it past the torch-state-dict converter)."""
    flat = flatten_params(encoder_params)
    flat[FLAX_MARKER] = np.asarray(1)
    np.savez(path, **flat)


# ---------------------------------------------------------------------------
# MLM pretraining loop
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MLMConfig:
    epochs: int = 30
    batch_size: int = 64
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    warmup_fraction: float = 0.05
    mask_prob: float = 0.15
    seed: int = 42
    scan_steps: int = 8              # optimizer steps per device dispatch
    char_noise_copies: int = 3       # corpus augmentation factor
    char_noise_word_prob: float = 0.15
    # Sequence packing (ops/packing.py): pack the tokenized corpus once into
    # full rows with segment-masked attention + per-segment positions.
    # Co-packed texts never attend each other, so the MLM objective is
    # unchanged — only ~padding-ratio× fewer rows per epoch.  batch_size
    # then counts PACKED rows.
    pack: bool = False


def mlm_pretrain(text_cfg: TextEncoderConfig, ids: np.ndarray,
                 mask: np.ndarray, tok, mlm_cfg: MLMConfig = MLMConfig(),
                 ) -> Tuple[Dict, List[float]]:
    """Pretrain a TextEncoder with dynamic-masking MLM over pre-tokenized
    ``ids``/``mask`` [N, L].  Returns ``(encoder_params, per_epoch_loss)``.

    Masking follows BERT: 15% of real (non-special) positions are selected
    per step — 80% replaced by [MASK], 10% by a random token, 10% kept —
    and the loss is CE on the selected positions only.  Selection is
    re-sampled every step on device (dynamic masking: every epoch sees a
    different corruption of the same corpus).
    """
    import jax
    import jax.numpy as jnp
    import optax

    segments = positions = None
    if mlm_cfg.pack:
        from mpmc_tpu.ops.packing import pack_sequences
        packed = pack_sequences(ids, mask, ids.shape[1])
        log.info("MLM packing: %d texts -> %d rows of %d "
                 "(%.1fx fewer rows)", ids.shape[0], packed.num_rows,
                 ids.shape[1], ids.shape[0] / max(packed.num_rows, 1))
        ids = packed.ids
        segments, positions = packed.segments, packed.positions
        mask = (segments > 0).astype(np.int32)

    n, L = ids.shape
    bs = min(mlm_cfg.batch_size, n)
    steps_per_epoch = max(n // bs, 1)
    total_steps = steps_per_epoch * mlm_cfg.epochs
    model = _build_mlm_model(text_cfg)

    mask_id = tok.vocab.get("[MASK]")
    if mask_id is None:
        raise ValueError("MLM pretraining needs a [MASK] token in the vocab")
    special = jnp.asarray([tok.cls_id if hasattr(tok, "cls_id")
                           else tok.vocab["[CLS]"],
                           tok.vocab["[SEP]"], tok.vocab["[PAD]"],
                           mask_id], jnp.int32)

    variables = model.init(jax.random.key(mlm_cfg.seed), ids[:2], mask[:2])
    sched = optax.warmup_cosine_decay_schedule(
        0.0, mlm_cfg.learning_rate,
        max(int(mlm_cfg.warmup_fraction * total_steps), 1), total_steps)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=mlm_cfg.weight_decay))
    params = variables["params"]
    opt_state = tx.init(params)

    def step(params, opt_state, batch_ids, batch_mask, seg_pos, rng):
        # ``seg_pos`` is {} (unpacked) or {"seg","pos"} packed-row arrays —
        # an empty dict is a leafless pytree, so one scan body serves both.
        k_sel, k_kind, k_rand, k_drop = jax.random.split(rng, 4)
        real = (batch_mask == 1) & ~jnp.isin(batch_ids, special)
        sel = (jax.random.uniform(k_sel, batch_ids.shape)
               < mlm_cfg.mask_prob) & real
        kind = jax.random.uniform(k_kind, batch_ids.shape)
        rand_tok = jax.random.randint(k_rand, batch_ids.shape, 0,
                                      text_cfg.vocab_size)
        corrupted = jnp.where(kind < 0.8, mask_id,
                              jnp.where(kind < 0.9, rand_tok, batch_ids))
        inp = jnp.where(sel, corrupted, batch_ids)

        def loss_fn(p):
            logits = model.apply({"params": p}, inp, batch_mask, train=True,
                                 rngs={"dropout": k_drop},
                                 segments=seg_pos.get("seg"),
                                 positions=seg_pos.get("pos"))
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, batch_ids[..., None],
                                       axis=-1)[..., 0]
            w = sel.astype(jnp.float32)
            return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    k = max(min(mlm_cfg.scan_steps, steps_per_epoch), 1)

    @jax.jit
    def scan_step(params, opt_state, b_ids, b_mask, b_seg_pos, rngs):
        def body(carry, xs):
            p, o = carry
            bi, bm, sp, r = xs
            p, o, loss = step(p, o, bi, bm, sp, r)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (b_ids, b_mask, b_seg_pos, rngs))
        return params, opt_state, losses

    rng = np.random.default_rng(mlm_cfg.seed)
    key = jax.random.key(mlm_cfg.seed)
    epoch_losses: List[float] = []
    for epoch in range(mlm_cfg.epochs):
        perm = rng.permutation(n)
        pend = []
        for start in range(0, steps_per_epoch - k + 1, k):
            rows = perm[start * bs:(start + k) * bs]
            rows = rows[: k * bs]
            if len(rows) < k * bs:
                rows = np.concatenate([rows, perm[:k * bs - len(rows)]])
            b_ids = ids[rows].reshape(k, bs, L)
            b_mask = mask[rows].reshape(k, bs, L)
            b_seg_pos = ({"seg": segments[rows].reshape(k, bs, L),
                          "pos": positions[rows].reshape(k, bs, L)}
                         if segments is not None else {})
            key, sub = jax.random.split(key)
            params, opt_state, losses = scan_step(
                params, opt_state, b_ids, b_mask, b_seg_pos,
                jax.random.split(sub, k))
            pend.append(losses)
        ep_loss = float(np.mean(np.concatenate(
            [np.asarray(p) for p in pend]))) if pend else float("nan")
        epoch_losses.append(ep_loss)
        if epoch % 5 == 0 or epoch == mlm_cfg.epochs - 1:
            log.info("MLM | epoch %d/%d | loss %.4f", epoch,
                     mlm_cfg.epochs, ep_loss)
    return jax.device_get(params["encoder"]), epoch_losses


def pretrain_and_save(text_cfg: TextEncoderConfig, texts: Sequence[str],
                      tok, out_path: str,
                      mlm_cfg: MLMConfig = MLMConfig(),
                      max_len: int = 64) -> str:
    """Corpus → char-noise augmentation → tokenize → MLM → npz.  Returns
    ``out_path`` (feedable to ``PretrainedSpec.text`` / ``--text-params``)."""
    rng = np.random.default_rng(mlm_cfg.seed)
    corpus = char_noise(texts, rng, copies=mlm_cfg.char_noise_copies,
                        word_prob=mlm_cfg.char_noise_word_prob)
    ids, mask = tok.encode_batch(corpus, max_len)
    log.info("MLM corpus: %d texts (%d original + %dx noise), seq %d",
             len(corpus), len(texts), mlm_cfg.char_noise_copies, max_len)
    enc_params, losses = mlm_pretrain(text_cfg, ids, mask, tok, mlm_cfg)
    save_encoder_params(enc_params, out_path)
    log.info("MLM encoder saved to %s (loss %.3f → %.3f)", out_path,
             losses[0], losses[-1])
    return out_path
