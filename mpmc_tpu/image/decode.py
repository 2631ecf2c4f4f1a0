"""Host-side image decode + resize (reference C4/C15 input path).

The reference decodes with PIL/torchvision inside ``Dataset.__getitem__``
every epoch, single-threaded (``Multimodal_example_task2C.py:262-304`` —
SURVEY.md §3.1 flags this as its biggest CPU bottleneck).  Here decode is a
host preprocessing stage with three backends, fastest first:

1. ``native/image_decode.cpp`` — C++ libjpeg/libpng decode + bilinear resize,
   loaded via ctypes (built by ``native/build.sh``), threadable (releases the
   GIL during decode);
2. PIL (always present in this image);
3. deterministic synthetic pixels when the file is missing — the ArAIEval
   image tarball is distributed separately (reference ``bin/setup.sh:9-11``),
   so smoke/bench runs must work without it.

Output: uint8 RGB [H, W, 3] at the requested size (grayscale [H, W, 1] for
the 2B HF-Trainer variant, ``ResNet_example_task2B.py:156``).
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_native = None
_native_checked = False


def _load_native():
    global _native, _native_checked
    if _native_checked:
        return _native
    _native_checked = True
    try:
        from mpmc_tpu.image import native  # built lazily
        _native = native if native.available() else None
    except Exception:
        _native = None
    return _native


def _synthetic(path: str, size: int, channels: int) -> np.ndarray:
    """Deterministic pseudo-image derived from the path hash."""
    seed = int.from_bytes(hashlib.sha256(path.encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (8, 8, channels), dtype=np.uint8)
    reps = (size + 7) // 8
    img = np.tile(base, (reps, reps, 1))[:size, :size]
    return np.ascontiguousarray(img)


def _resize_bilinear_u8(img: np.ndarray, size: int) -> np.ndarray:
    """Pure-numpy bilinear resize (PIL-free fallback path)."""
    h, w = img.shape[:2]
    ys = (np.arange(size) + 0.5) * h / size - 0.5
    xs = (np.arange(size) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    img = img.astype(np.float32)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy, 0, 255).astype(np.uint8)


def decode_image(path: str, size: int = 224, grayscale: bool = False,
                 root: str = ".",
                 missing: Optional[list] = None) -> np.ndarray:
    """Decode one image file → uint8 [size, size, C].

    A missing/undecodable file yields deterministic synthetic pixels (for
    smoke/bench runs without the image tarball); the path is appended to
    ``missing`` so callers can warn or abort (ADVICE r1: a wrong image_root
    must not silently train on noise)."""
    channels = 1 if grayscale else 3
    full = os.path.join(root, path)
    if not os.path.exists(full):
        if missing is not None:
            missing.append(path)
        return _synthetic(path, size, channels)

    native = _load_native()
    if native is not None:
        out = native.decode_resize(full, size, grayscale)
        if out is not None:
            return out

    try:
        from PIL import Image
        with Image.open(full) as im:
            im = im.convert("L" if grayscale else "RGB")
            im = im.resize((size, size), Image.BILINEAR)
            arr = np.asarray(im, dtype=np.uint8)
            if grayscale:
                arr = arr[..., None]
            return arr
    except Exception:
        if missing is not None:
            missing.append(path)
        return _synthetic(path, size, channels)


def decode_batch(paths: Sequence[str], size: int = 224,
                 grayscale: bool = False, root: str = ".",
                 num_threads: int = 8, strict: bool = False) -> np.ndarray:
    """Parallel decode → uint8 [N, size, size, C].

    Missing/undecodable files are logged with a count; ``strict=True``
    raises instead (real training/scoring runs should not substitute
    synthetic pixels unnoticed)."""
    from concurrent.futures import ThreadPoolExecutor
    out = np.empty((len(paths), size, size, 1 if grayscale else 3), np.uint8)
    missing: list = []

    def work(i):
        out[i] = decode_image(paths[i], size, grayscale, root, missing)

    if len(paths) > 1 and num_threads > 1:
        with ThreadPoolExecutor(num_threads) as ex:
            list(ex.map(work, range(len(paths))))
    else:
        for i in range(len(paths)):
            work(i)
    if missing:
        msg = (f"{len(missing)}/{len(paths)} images missing or undecodable "
               f"under root={root!r} (e.g. {missing[0]!r}) — synthetic "
               f"pixels substituted")
        if strict:
            raise FileNotFoundError(msg)
        log.warning("%s", msg)
    return out
