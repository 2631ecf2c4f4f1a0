"""Deterministic seeding (reference ``seed_everything``,
``Multimodal_example_task2C.py:42-48``).

JAX is functionally seeded (explicit PRNG keys), so unlike the reference
there is no global framework RNG to pin; this seeds the host-side RNGs
(python/numpy, used for shuffling and fold splits) and returns the root JAX
key for the functional side.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 42):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax
    return jax.random.key(seed)
