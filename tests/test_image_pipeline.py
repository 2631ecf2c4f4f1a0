"""image layer: decode fallbacks, prefetching batch iterator, pipeline cache."""

import numpy as np
import pytest

from mpmc_tpu.image.decode import decode_batch, decode_image
from mpmc_tpu.image.pipeline import ImagePipeline


def test_decode_missing_is_deterministic():
    a = decode_image("no/such/file.jpg", 32)
    b = decode_image("no/such/file.jpg", 32)
    c = decode_image("other/file.jpg", 32)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    assert not np.array_equal(a, c)


def test_decode_real_file(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    img = (rng.random((80, 60, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(img).save(p)
    out = decode_image(str(p), 48, root="/")
    assert out.shape == (48, 48, 3)


def test_decode_batch_grayscale():
    out = decode_batch(["a.jpg", "b.jpg"], 16, grayscale=True)
    assert out.shape == (2, 16, 16, 1)


def test_pipeline_batches_prefetch():
    paths = [f"img_{i}.jpg" for i in range(10)]
    pipe = ImagePipeline(paths, size=16)
    cache = pipe.preload()
    assert cache.shape == (10, 16, 16, 3)
    assert pipe.preload() is cache  # cached

    puts = []
    idx = np.arange(10)

    def put(x):
        puts.append(x.shape)
        return x.astype(np.int32) * 2  # proves `put` ran on the producer side

    batches = list(pipe.batches(idx, 4, put=put))
    assert len(batches) == 3
    shapes = [b.shape for b, _ in batches]
    assert shapes == [(4, 16, 16, 3)] * 3  # last batch padded
    valids = [n for _, n in batches]
    assert valids == [4, 4, 2]
    # reconstruct original data through the doubled values
    recon = np.concatenate([b[:n] for b, n in batches]) // 2
    np.testing.assert_array_equal(recon, cache)


def test_pipeline_batches_shuffled_order():
    paths = [f"img_{i}.jpg" for i in range(8)]
    pipe = ImagePipeline(paths, size=8)
    cache = pipe.preload()
    order = np.array([7, 0, 3, 1, 2, 6, 5, 4])
    got = np.concatenate([b[:n] for b, n in pipe.batches(order, 3)])
    np.testing.assert_array_equal(got, cache[order])


def test_fused_pallas_kernel_interpret(rng):
    """Fused normalize kernel in interpreter mode vs the jnp reference
    (compiled-mode parity is exercised on real TPU hardware)."""
    import jax
    import jax.numpy as jnp
    from mpmc_tpu.image.augment import IMAGENET_MEAN, IMAGENET_STD
    from mpmc_tpu.ops.image_ops import fused_normalize_flip_brightness

    u8 = jnp.asarray(rng.integers(0, 256, (4, 16, 16, 3)), jnp.uint8)
    flip = jnp.asarray([1, 0, 1, 0])
    bright = jnp.asarray([0.95, 1.05, 1.0, 0.9], jnp.float32)
    got = fused_normalize_flip_brightness(u8, flip, bright, interpret=True)

    x = np.asarray(u8, np.float32) / 255.0
    x[flip.astype(bool)] = x[np.asarray(flip, bool)][:, :, ::-1]
    x = np.clip(x * np.asarray(bright)[:, None, None, None], 0, 1)
    exp = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5)
