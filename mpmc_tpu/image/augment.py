"""Device-side image augmentation + normalization (reference C15 transforms).

The reference runs torchvision transforms per sample on the host CPU every
epoch (``Multimodal_example_task2C.py:222-235``: Resize(224²) → HFlip →
ColorJitter(0.1) → Rotation(15°) → ToTensor → ImageNet-Normalize).  Here the
host only decodes/resizes to uint8; everything photometric/geometric runs
batched on the TPU inside the jitted step:

* ``train_augment(key, u8)`` — random horizontal flip (p=.5), brightness
  jitter ×U[0.9, 1.1], rotation U[-15°, 15°] (gather-free Paeth 3-shear,
  zero fill — see ``_rotate_shear``), then u8→f32 ImageNet normalization —
  one fused XLA program, with the normalize+flip+brightness core available
  as a Pallas kernel (``mpmc_tpu.ops.image_ops``).
* ``eval_preprocess(u8)`` — normalization only (plus optional center-crop
  from a larger decode, the C28/C25 Resize(256)/CenterCrop(224) variant).

Divergence noted: the reference applies its *augmenting* transform to eval
splits too (same Dataset class for train/val/test); we default to
deterministic eval preprocessing and expose ``train_augment`` for callers who
want bug-compatible behavior.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# grayscale variant (reference ResNet_example_task2B.py:163-166)
GRAY_MEAN, GRAY_STD = (0.45,), (0.22,)


def normalize(x: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    """uint8 [B,H,W,C] → normalized f32."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x.astype(jnp.float32) / 255.0 - mean) / std


def _rotate_bilinear(img: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate one [H,W,C] f32 image by ``angle`` radians around its center,
    bilinear sampling, zeros outside (torchvision RandomRotation default)."""
    H, W = img.shape[0], img.shape[1]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # inverse mapping: output pixel ← input coordinate
    sy = cy + (yy - cy) * cos - (xx - cx) * sin
    sx = cx + (yy - cy) * sin + (xx - cx) * cos
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0

    def gather(yi, xi):
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = img[yi, xi]
        return jnp.where(valid[..., None], vals, 0.0)

    top = gather(y0, x0) * (1 - wx)[..., None] + gather(y0, x0 + 1) * wx[..., None]
    bot = gather(y0 + 1, x0) * (1 - wx)[..., None] + gather(y0 + 1, x0 + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _shear_rolls(x: jax.Array, t: jax.Array, axis: int, dmax: int
                 ) -> jax.Array:
    """1-D bilinear resample along ``axis`` with a per-line continuous shift
    ``t`` (out = in[pos - t], zeros outside), computed WITHOUT gathers: a
    weighted sum over the 2·dmax+1 integer shifts, each a static ``roll``
    (contiguous copy — VPU/HBM friendly).  Per output line at most two
    shifts carry weight (the bilinear pair), the rest multiply by zero.

    x: [B, H, W, C]; axis=2 shears rows (t is [B, H]), axis=1 shears
    columns (t is [B, W])."""
    L = x.shape[axis]
    idx = jnp.arange(L)
    out = jnp.zeros_like(x)
    for d in range(-dmax, dmax + 1):
        # weights in the image dtype so a bf16 x stays bf16 end-to-end
        w = jnp.clip(1.0 - jnp.abs(t - d), 0.0, 1.0).astype(x.dtype)
        if axis == 2:
            w_b = w[:, :, None, None]
            valid = ((idx >= d) & (idx < L + d))[None, None, :, None]
        else:
            w_b = w[:, None, :, None]
            valid = ((idx >= d) & (idx < L + d))[None, :, None, None]
        out = out + jnp.roll(x, d, axis=axis) * w_b * valid
    return out


def _rotate_shear(x: jax.Array, angle: jax.Array, max_deg: float
                  ) -> jax.Array:
    """Batched rotation by per-image ``angle`` via the Paeth 3-shear
    decomposition R(θ) = ShearX(-tan θ/2) · ShearY(sin θ) · ShearX(-tan θ/2),
    each shear a weighted-roll resample (``_shear_rolls``).

    The direct bilinear gather (``_rotate_bilinear``) costs ~27 ms per
    16×224² batch on TPU — XLA lowers the [H, W] fancy index to a 50k-point
    gather per image, pathological on this hardware.  This formulation is
    gather-free (~1 ms) at the cost of three 1-D resamples instead of one
    2-D one (slightly more blur; both are valid augmentations — the
    reference's torchvision rotation draws different random angles anyway).
    """
    import numpy as np
    H, W = x.shape[1], x.shape[2]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    # The shears are HBM-bound (2·dmax+1 full-image rolls each); bf16
    # halves that traffic.  8-bit image data in [~-2.2, 2.7] after ImageNet
    # normalization loses nothing that matters to an augmentation, and the
    # model consumes bf16 anyway under the bf16 policy.
    out_dtype = x.dtype
    x = x.astype(jnp.bfloat16)
    a = jnp.asarray(angle)
    alpha = -jnp.tan(a / 2.0)  # [B]
    beta = jnp.sin(a)
    rows = jnp.arange(H, dtype=jnp.float32) - cy
    cols = jnp.arange(W, dtype=jnp.float32) - cx
    tx = alpha[:, None] * rows[None, :]  # [B, H] row shift for x-shears
    ty = beta[:, None] * cols[None, :]   # [B, W] col shift for the y-shear
    rad = np.radians(max_deg)
    dmax_x = int(np.ceil(np.tan(rad / 2.0) * max(H, W) / 2.0)) + 1
    dmax_y = int(np.ceil(np.sin(rad) * max(H, W) / 2.0)) + 1
    x = _shear_rolls(x, tx, axis=2, dmax=dmax_x)
    x = _shear_rolls(x, ty, axis=1, dmax=dmax_y)
    x = _shear_rolls(x, tx, axis=2, dmax=dmax_x)
    return x.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("max_rotate_deg", "use_pallas"))
def train_augment(key: jax.Array, images_u8: jax.Array,
                  max_rotate_deg: float = 15.0,
                  use_pallas: Optional[bool] = None) -> jax.Array:
    """Random flip + brightness + rotation + normalize, batched on device.

    ``use_pallas=None`` auto-selects: the fused Pallas kernel on TPU
    (measured 2.4× the unfused XLA chain), XLA elsewhere.
    """
    if use_pallas is None:
        from mpmc_tpu.ops.attention import _DEFAULT_IMPL, _on_tpu
        use_pallas = (_DEFAULT_IMPL or
                      ("pallas" if _on_tpu() else "xla")) == "pallas"
    B = images_u8.shape[0]
    k_flip, k_bright, k_rot = jax.random.split(key, 3)
    flip = jax.random.bernoulli(k_flip, 0.5, (B,))
    bright = jax.random.uniform(k_bright, (B,), minval=0.9, maxval=1.1)
    angle = jax.random.uniform(
        k_rot, (B,), minval=-max_rotate_deg, maxval=max_rotate_deg
    ) * (jnp.pi / 180.0)

    if use_pallas:
        from mpmc_tpu.ops.image_ops import fused_normalize_flip_brightness
        x = fused_normalize_flip_brightness(images_u8, flip, bright)
    else:
        x = images_u8.astype(jnp.float32) / 255.0
        x = jnp.where(flip[:, None, None, None],
                      jnp.flip(x, axis=2), x)
        x = jnp.clip(x * bright[:, None, None, None], 0.0, 1.0)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = (x - mean) / std
    return _rotate_shear(x, angle, max_rotate_deg)


@functools.partial(jax.jit, static_argnames=("crop", "grayscale"))
def eval_preprocess(images_u8: jax.Array, crop: Optional[int] = None,
                    grayscale: bool = False) -> jax.Array:
    """Deterministic eval path: optional center crop + normalize."""
    x = images_u8
    if crop is not None:
        H, W = x.shape[1], x.shape[2]
        top, left = (H - crop) // 2, (W - crop) // 2
        x = x[:, top:top + crop, left:left + crop]
    if grayscale:
        return normalize(x, GRAY_MEAN, GRAY_STD)
    return normalize(x)
