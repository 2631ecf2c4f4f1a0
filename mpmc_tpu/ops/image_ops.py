"""Pallas kernel: fused uint8→f32 normalize + horizontal flip + brightness.

Device-side replacement for the reference's per-sample ToTensor + Normalize +
HFlip + ColorJitter host transforms (``Multimodal_example_task2C.py:222-235``).
One pass over the batch in VMEM: u8 load → scale → predicated lane-reversal
flip → brightness gain → ImageNet mean/std — the entire photometric chain at
HBM-bandwidth cost of a single read+write instead of four host-memory passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpmc_tpu.image.augment import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


def _kernel(bright_ref, img_ref, stats_ref, out_ref):
    # Mosaic has no direct u8→f32 cast; widen through int32 first.
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    # scalar-prefetch refs see the full [B] array: index by grid position
    x = jnp.clip(x * bright_ref[pl.program_id(0)], 0.0, 1.0)
    mean = stats_ref[0]          # [W*C] (per-channel stats tiled along lanes)
    inv_std = stats_ref[1]       # [W*C]
    out_ref[0] = (x - mean[None, :]) * inv_std[None, :]


def fused_normalize_flip_brightness(images_u8: jax.Array, flip: jax.Array,
                                    bright: jax.Array,
                                    interpret: bool = False) -> jax.Array:
    """images_u8 uint8 [B,H,W,C]; flip bool [B]; bright f32 [B] → f32.

    The lane-reversal flip runs as an XLA ``rev`` on the *uint8* input (¼ the
    bytes of the f32 result; Mosaic cannot lower ``rev`` in-kernel), then one
    Pallas pass fuses widen + brightness gain + ImageNet normalization.
    """
    images_u8 = jnp.where(flip[:, None, None, None],
                          jnp.flip(images_u8, axis=2), images_u8)
    B, H, W, C = images_u8.shape
    # Lane-dim layout: C=3 alone would pad to 128 lanes (43× VMEM waste);
    # flatten (W, C) → W*C lanes and tile the per-channel stats to match.
    flat = images_u8.reshape(B, H, W * C)
    stats = jnp.stack([
        jnp.tile(jnp.asarray(IMAGENET_MEAN, jnp.float32), W),
        jnp.tile(1.0 / jnp.asarray(IMAGENET_STD, jnp.float32), W)])  # [2, W*C]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, W * C), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W * C), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * H * W * C * 5,
            bytes_accessed=B * H * W * C * 5,
            transcendentals=0,
        ),
    )(bright.astype(jnp.float32), flat, stats)
    return out.reshape(B, H, W, C)
