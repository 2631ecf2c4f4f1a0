"""ctypes loader for the C++ host runtime (native/libmpmc_native.so).

Builds the library on first use if the toolchain is available (g++ +
libjpeg/libpng, both baked into this image); callers degrade gracefully to
the pure-Python paths when the build is impossible.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO_PATH = os.path.join(_ROOT, "native", "libmpmc_native.so")
_BUILD = os.path.join(_ROOT, "native", "build.sh")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["sh", _BUILD], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        # tokenizer
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        # image
        lib.img_decode_resize.restype = ctypes.c_int
        lib.img_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return _lib
