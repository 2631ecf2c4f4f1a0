"""ops: focal loss / CE parity with torch, attention XLA-vs-interpreted-pallas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mpmc_tpu.ops import sigmoid_focal_loss, softmax_cross_entropy
from mpmc_tpu.ops.attention import dot_product_attention


def _torchvision_focal(inputs, targets, alpha=0.25, gamma=2.0):
    # torchvision.ops.sigmoid_focal_loss reimplemented from its documented
    # formula (the package is not installed here).
    p = torch.sigmoid(inputs)
    ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.mean()


def test_focal_loss_matches_torch(rng):
    logits = rng.standard_normal(64).astype(np.float32) * 3
    targets = (rng.random(64) > 0.7).astype(np.float32)
    ours = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets))
    ref = _torchvision_focal(torch.tensor(logits), torch.tensor(targets))
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


def test_focal_loss_reductions(rng):
    logits = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    targets = jnp.asarray((rng.random(8) > 0.5).astype(np.float32))
    none = sigmoid_focal_loss(logits, targets, reduction="none")
    assert none.shape == (8,)
    assert float(sigmoid_focal_loss(logits, targets, reduction="sum")) == \
        pytest.approx(float(jnp.sum(none)), rel=1e-6)


def test_ce_matches_torch(rng):
    logits = rng.standard_normal((32, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 32)
    w = np.array([0.7, 1.9], dtype=np.float32)
    ours = softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                 class_weights=jnp.asarray(w))
    ref = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                          weight=torch.tensor(w))
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)
    ours_u = softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    ref_u = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    assert float(ours_u) == pytest.approx(float(ref_u), rel=1e-5)


def test_attention_xla_masking(rng):
    B, S, H, D = 2, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    mask = np.ones((B, S), np.float32)
    mask[:, S // 2:] = 0
    out_full = dot_product_attention(q, k, v, jnp.asarray(mask), impl="xla")
    # masked keys must not influence the output: perturb them
    k2 = k.at[:, S // 2:].set(99.0)
    v2 = v.at[:, S // 2:].set(-99.0)
    out_pert = dot_product_attention(q, k2, v2, jnp.asarray(mask), impl="xla")
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_pert),
                               atol=1e-5)


def test_attention_matches_torch(rng):
    B, S, H, D = 2, 12, 3, 8
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    ours = dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), impl="xla")
    tq = torch.tensor(q).permute(0, 2, 1, 3)
    tk = torch.tensor(k).permute(0, 2, 1, 3)
    tv = torch.tensor(v).permute(0, 2, 1, 3)
    ref = F.scaled_dot_product_attention(tq, tk, tv).permute(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_attention_grads_finite(rng):
    B, S, H, D = 2, 8, 2, 4
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, S)) > 0.3).astype(np.float32))

    def f(q):
        return jnp.sum(dot_product_attention(q, q, q, mask, impl="xla"))

    g = jax.grad(f)(q)
    assert np.isfinite(np.asarray(g)).all()
