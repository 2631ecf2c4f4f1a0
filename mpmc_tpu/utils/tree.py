"""Pytree path helpers shared by the optimizer labeling (train/step.py)
and the TP sharding rules (parallel/tp.py)."""

from __future__ import annotations


def path_str(path) -> str:
    """Join a jax key path into "a/b/c", robust to DictKey (.key),
    FlattenedIndexKey (.key), GetAttrKey (.name) and SequenceKey (.idx)
    entries."""
    parts = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if name is None:
            name = getattr(k, "idx", None)
        parts.append(str(name))
    return "/".join(parts)
