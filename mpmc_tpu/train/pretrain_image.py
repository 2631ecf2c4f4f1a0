"""Self-supervised image pretraining (SimCLR-style contrastive learning).

The image-branch counterpart of ``train/pretrain.py``'s corpus MLM stage
(VERDICT r2 next-round #2: "optionally SimCLR-style image pretraining when
real pixels exist").  The reference's image quality comes from downloaded
timm/torchvision weights (``Multimodal_example_task2C.py:83``,
``Untitled-2.py:362-371``); with no network access the rebuilt framework's
image backbones start cold.  This stage pretrains them on the task images
themselves: two independently-augmented views of each meme through the
SAME on-device augmentation chain the supervised loop uses
(``image/augment.train_augment`` — flip/brightness/3-shear-rotation/
normalize), a projection MLP, and the NT-Xent contrastive objective
(normalized temperature-scaled cross entropy over in-batch negatives).

The resulting backbone params (+ BatchNorm running stats) are saved as a
flax-tree ``.npz`` that the standard ``PretrainedSpec.image`` splice path
consumes — every driver (2B, 2C image branch) can start from them via
``--image-params`` / ``cfg.simclr_epochs``.

All compute is a single jitted scan-fused step over a device-resident
uint8 image array: the host ships only int32 row indices per dispatch
(the same HBM-resident design as the supervised drivers — the tunneled
chip's ~25-50 MB/s H2D link cannot stream pixel batches).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Tuple

import numpy as np

from mpmc_tpu.config import ImageEncoderConfig

log = logging.getLogger(__name__)

FLAX_IMAGE_MARKER = "__flax_image_encoder__"


@dataclasses.dataclass(frozen=True)
class SimCLRConfig:
    epochs: int = 30
    batch_size: int = 64
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    warmup_fraction: float = 0.05
    temperature: float = 0.5
    proj_dim: int = 128
    max_rotate_deg: float = 15.0
    seed: int = 42
    scan_steps: int = 4              # optimizer steps per device dispatch


def _build_simclr_model(cfg: ImageEncoderConfig, proj_dim: int):
    import flax.linen as nn

    from mpmc_tpu.models.classifier import create_image_backbone

    class SimCLRModel(nn.Module):
        """Backbone (submodule name ``backbone`` — the exact subtree the
        classifier splice consumes) + 2-layer projection MLP (discarded
        after pretraining, as in SimCLR)."""
        cfg: ImageEncoderConfig
        proj_dim: int

        @nn.compact
        def __call__(self, image, train: bool = False):
            feats = create_image_backbone(self.cfg, name="backbone")(
                image, train=train)
            h = nn.Dense(feats.shape[-1], name="proj_fc1")(feats)
            h = nn.relu(h)
            return nn.Dense(self.proj_dim, name="proj_fc2")(h)

    return SimCLRModel(cfg, proj_dim)


def nt_xent_loss(z1, z2, temperature: float):
    """NT-Xent over a [2B, D] batch of l2-normalized projections: each
    view's positive is its sibling view; the other 2B-2 rows are negatives.
    Computed in f32 with the diagonal masked out of the softmax."""
    import jax.numpy as jnp
    import optax

    z = jnp.concatenate([z1, z2], axis=0).astype(jnp.float32)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    sim = z @ z.T / temperature
    n = sim.shape[0]
    sim = jnp.where(jnp.eye(n, dtype=bool), -1e9, sim)
    b = n // 2
    targets = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    return optax.softmax_cross_entropy_with_integer_labels(
        sim, targets).mean()


def simclr_pretrain(img_cfg: ImageEncoderConfig, images_u8: np.ndarray,
                    cfg: SimCLRConfig = SimCLRConfig(),
                    ) -> Tuple[Dict, Dict, List[float]]:
    """Pretrain an image backbone contrastively over uint8 images
    [N, H, W, 3].  Returns ``(backbone_params, backbone_batch_stats,
    per_epoch_loss)``.

    The image array is uploaded to HBM once; each scan-fused dispatch
    gathers its [K, B] rows on device and builds both augmented views
    in-step (dynamic augmentation: every epoch sees different views).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from mpmc_tpu.image.augment import train_augment

    n = images_u8.shape[0]
    bs = min(cfg.batch_size, n)
    steps_per_epoch = max(n // bs, 1)
    total_steps = steps_per_epoch * cfg.epochs
    model = _build_simclr_model(img_cfg, cfg.proj_dim)

    ex = images_u8[:2].astype(np.float32) / 255.0
    variables = model.init(jax.random.key(cfg.seed), ex, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate,
        max(int(cfg.warmup_fraction * total_steps), 1), total_steps)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=cfg.weight_decay))
    opt_state = tx.init(params)

    def step(params, batch_stats, opt_state, data_u8, rows, rng):
        imgs = jnp.take(data_u8, rows, axis=0)
        k1, k2, kd = jax.random.split(rng, 3)
        v1 = train_augment(k1, imgs, max_rotate_deg=cfg.max_rotate_deg)
        v2 = train_augment(k2, imgs, max_rotate_deg=cfg.max_rotate_deg)

        def loss_fn(p):
            both = jnp.concatenate([v1, v2], axis=0)
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, both, train=True,
                rngs={"dropout": kd}, mutable=["batch_stats"])
            z1, z2 = out[:v1.shape[0]], out[v1.shape[0]:]
            return nt_xent_loss(z1, z2, cfg.temperature), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                mut.get("batch_stats", batch_stats), opt_state, loss)

    k = max(min(cfg.scan_steps, steps_per_epoch), 1)

    @jax.jit
    def scan_step(params, batch_stats, opt_state, data_u8, rows, rngs):
        def body(carry, xs):
            p, bstats, o = carry
            r, key = xs
            p, bstats, o, loss = step(p, bstats, o, data_u8, r, key)
            return (p, bstats, o), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), (rows, rngs))
        return params, batch_stats, opt_state, losses

    dev_images = jax.device_put(images_u8)
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.key(cfg.seed)
    epoch_losses: List[float] = []
    for epoch in range(cfg.epochs):
        perm = rng.permutation(n)
        pend = []
        for start in range(0, steps_per_epoch - k + 1, k):
            rows = perm[start * bs:(start + k) * bs][: k * bs]
            if len(rows) < k * bs:
                rows = np.concatenate([rows, perm[:k * bs - len(rows)]])
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, losses = scan_step(
                params, batch_stats, opt_state, dev_images,
                rows.reshape(k, bs).astype(np.int32),
                jax.random.split(sub, k))
            pend.append(losses)
        ep = float(np.mean(np.concatenate([np.asarray(p) for p in pend]))
                   ) if pend else float("nan")
        epoch_losses.append(ep)
        if epoch % 5 == 0 or epoch == cfg.epochs - 1:
            log.info("SimCLR | epoch %d/%d | loss %.4f", epoch,
                     cfg.epochs, ep)
    return (jax.device_get(params["backbone"]),
            jax.device_get(batch_stats.get("backbone", {})),
            epoch_losses)


def save_image_encoder_params(backbone_params, backbone_batch_stats,
                              path: str) -> None:
    """Save a backbone (params + BatchNorm running stats) as a flax-tree
    npz that ``models.pretrained._convert_image`` recognizes by its marker
    entry (routing it past the torch-layout vision converter)."""
    from mpmc_tpu.train.pretrain import flatten_params

    flat = {f"params/{k}": v
            for k, v in flatten_params(backbone_params).items()}
    flat.update({f"batch_stats/{k}": v
                 for k, v in flatten_params(backbone_batch_stats).items()})
    flat[FLAX_IMAGE_MARKER] = np.asarray(1)
    np.savez(path, **flat)


def pretrain_and_save_image(img_cfg: ImageEncoderConfig,
                            images_u8: np.ndarray, out_path: str,
                            cfg: SimCLRConfig = SimCLRConfig()) -> str:
    """Images → SimCLR → npz.  Returns ``out_path`` (feedable to
    ``PretrainedSpec.image`` / ``--image-params``)."""
    params, bstats, losses = simclr_pretrain(img_cfg, images_u8, cfg)
    save_image_encoder_params(params, bstats, out_path)
    log.info("SimCLR backbone saved to %s (loss %.3f → %.3f)", out_path,
             losses[0], losses[-1])
    return out_path
