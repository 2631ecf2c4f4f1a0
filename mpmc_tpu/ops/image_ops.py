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


def _kernel(flip_ref, bright_ref, img_ref, out_ref):
    x = img_ref[0].astype(jnp.float32) * (1.0 / 255.0)   # [H, W, C]
    flipped = jnp.flip(x, axis=1)
    do_flip = flip_ref[0] > 0
    x = jnp.where(do_flip, flipped, x)
    x = jnp.clip(x * bright_ref[0], 0.0, 1.0)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    inv_std = 1.0 / jnp.asarray(IMAGENET_STD, jnp.float32)
    out_ref[0] = (x - mean) * inv_std


def fused_normalize_flip_brightness(images_u8: jax.Array, flip: jax.Array,
                                    bright: jax.Array) -> jax.Array:
    """images_u8 uint8 [B,H,W,C]; flip bool [B]; bright f32 [B] → f32."""
    B, H, W, C = images_u8.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * H * W * C * 5,
            bytes_accessed=B * H * W * C * 5,
            transcendentals=0,
        ),
    )(flip.astype(jnp.int32), bright.astype(jnp.float32), images_u8)
