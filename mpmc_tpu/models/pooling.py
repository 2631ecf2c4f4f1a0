"""Six pooling strategies over encoder hidden states (reference C11).

Formula-parity with ``LLMWithClassificationHead``
(``Multimodal_example_task2C.py:338-392`` / ``textmodel_example_task2A.py:291-383``):

* cls        — last_hidden_state[:, 0]
* nopooling  — last_hidden_state unchanged
* max        — max over sequence axis (unmasked, like the reference)
* mean       — attention-mask-weighted mean with 1e-9 clamp
* attention  — Linear(H→A) → tanh → Linear(A→1) scores, masked additive -1e9,
               softmax over sequence, weighted sum
* cnn        — Conv1d(H→H, k=3, same padding) → ReLU → max over sequence
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mpmc_tpu.config import PoolingType


class Pooler(nn.Module):
    pooling: PoolingType
    hidden_size: int = 768
    attention_hidden_size: int = 512
    cnn_kernel_size: int = 3

    @nn.compact
    def __call__(self, hidden, attention_mask):
        p = PoolingType(self.pooling)
        if p == PoolingType.CLS:
            return hidden[:, 0]
        if p == PoolingType.NOPOOLING:
            return hidden
        if p == PoolingType.MAX:
            return jnp.max(hidden, axis=1)
        if p == PoolingType.MEAN:
            m = attention_mask.astype(hidden.dtype)[..., None]
            s = jnp.sum(hidden * m, axis=1)
            denom = jnp.clip(jnp.sum(m, axis=1), min=1e-9)
            return s / denom
        if p == PoolingType.ATTENTION:
            scores = nn.Dense(self.attention_hidden_size, name="attn_fc1")(hidden)
            scores = nn.Dense(1, name="attn_fc2")(jnp.tanh(scores))[..., 0]
            scores = scores + (1.0 - attention_mask.astype(scores.dtype)) * -1e9
            weights = nn.softmax(scores, axis=1)
            return jnp.sum(hidden * weights[..., None], axis=1)
        if p == PoolingType.CNN:
            # Conv over the sequence axis, feature-preserving, 'same' padding
            # (torch Conv1d(hidden, hidden, k, padding=k//2)).
            h = nn.Conv(self.hidden_size, kernel_size=(self.cnn_kernel_size,),
                        padding="SAME", name="conv1d")(hidden)
            h = nn.relu(h)
            return jnp.max(h, axis=1)
        raise ValueError(f"Unsupported pooling type: {self.pooling}")
