"""Loss functions, fused into the jitted train step.

``sigmoid_focal_loss`` replaces the reference's torchvision C++/CUDA op
(``Multimodal_example_task2C.py:36,711``: alpha=0.25, gamma=2.0,
reduction='mean') — formula identical to torchvision.ops.sigmoid_focal_loss.
``softmax_cross_entropy`` covers the 2A CE path
(``textmodel_example_task2A.py:561``), with optional 'balanced' class weights
(computed-but-unused in the reference, ``Multimodal_example_task2C.py:137-139``
— here actually usable).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array,
                       alpha: float = 0.25, gamma: float = 2.0,
                       reduction: str = "mean") -> jax.Array:
    """Focal loss on single-logit binary outputs.

    logits/targets: float [...]; targets in {0, 1}.
    FL = alpha_t * (1 - p_t)^gamma * BCE(p, y), matching torchvision semantics
    (alpha applied to the positive class, 1-alpha to the negative).
    """
    targets = targets.astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    # Numerically stable BCE-with-logits.
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array,
                          class_weights: Optional[jax.Array] = None,
                          reduction: str = "mean") -> jax.Array:
    """CE over integer labels with optional per-class weights
    (torch.nn.CrossEntropyLoss semantics incl. weighted-mean normalization)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights[labels]
        if reduction == "mean":
            return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-9)
        nll = nll * w
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll
