"""Sequence/context parallelism: ring attention + Ulysses over a ``seq`` axis.

The reference pads every text to a fixed 512 tokens and attends on one device
(``Multimodal_example_task2C.py:276``); SURVEY.md §2.3/§5.7 marks long-context
parallelism as out of scope *for this workload* but requires the mesh design
to carry it.  This module is that carry: the transformer layer stack of
``models/bert.py`` runs with its activations sharded over a ``seq`` mesh axis,
so per-chip activation memory (and attention compute) scales as 1/P in
sequence — the TPU-native scaling path for drop-in long-context encoders.

Design (idiomatic JAX/TPU, mirroring ``parallel/pp.py``):

* every per-token op (QKV/MLP denses, LayerNorm, residuals) is local to the
  token shard — no communication, weights replicated;
* the only cross-shard mixing is attention itself, provided by two
  sequence-parallel impls in ``ops/attention.py``:
  - ``ring:<axis>`` — ring attention: K/V blocks rotate via neighbour
    ``lax.ppermute`` while each device accumulates blockwise-stable softmax
    for its local queries (flash-style running max/denominator; nothing
    ``[S, S]`` is ever materialized);
  - ``ulysses:<axis>`` — two ``lax.all_to_all`` re-shards swap sequence
    sharding for head sharding, attention runs exact and local over ``H/P``
    heads, then the inverse all_to_all restores sequence sharding;
* the backward pass is the autodiff transpose through shard_map (a ppermute
  transposes to the reverse rotation, an all_to_all to its inverse) — no
  hand-written reverse schedule;
* embeddings (which need global position ids) and the pooler/head (which
  reduce over the full sequence) run outside the shard_map region, sharded
  by ordinary jit propagation; the batch axis composes with ``data`` on a
  2-D ``(data, seq)`` mesh.

Layer dropout runs deterministic inside the SP region (same trade as the
pipeline harness — embedding/head dropout is unaffected); parity tests pin
both impls against the plain single-device forward exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpmc_tpu.config import ModelConfig
from mpmc_tpu.models.bert import EncoderLayer, TextEncoder
from mpmc_tpu.models.pooling import Pooler


def make_sp_stack(text_cfg, mesh: Mesh, impl: str = "ring",
                  seq_axis: str = "seq", data_axis: str = "data"):
    """shard_map'd transformer stack over sequence-sharded activations.

    Returns ``stack(layer_params, x [B,S,D], mask [B,S]) -> [B,S,D]`` where
    inside the region each device holds ``[B/data, S/seq, D]`` and layers
    mix across shards only through the ``impl`` attention collective.
    ``layer_params`` is the ``{layer_i: ...}`` sub-dict of the encoder tree,
    replicated.
    """
    if impl not in ("ring", "ulysses"):
        raise ValueError(f"unknown SP impl: {impl!r} "
                         "(expected 'ring' or 'ulysses')")
    layer = EncoderLayer(text_cfg, attn_impl=f"{impl}:{seq_axis}")
    num_layers = text_cfg.num_layers

    def run_stack(layer_params, x, mask):
        for i in range(num_layers):
            x = layer.apply({"params": layer_params[f"layer_{i}"]},
                            x, mask, True)
        return x

    return jax.shard_map(
        run_stack, mesh=mesh,
        in_specs=(P(), P(data_axis, seq_axis, None), P(data_axis, seq_axis)),
        out_specs=P(data_axis, seq_axis, None))


def make_sp_forward(mcfg: ModelConfig, mesh: Mesh, impl: str = "ring",
                    seq_axis: str = "seq", data_axis: str = "data"):
    """Full 2A text-classifier forward with the layer stack sequence-sharded.

    ``forward(params, input_ids, attention_mask) -> logits`` over the plain
    ``TextClassifier`` param tree — numerically identical (deterministic
    mode) to ``TextClassifier(mcfg).apply``.  The global sequence length
    must divide the ``seq`` axis size; batch must divide ``data``.
    """
    c = mcfg.text
    enc = TextEncoder(c)
    pooler = Pooler(mcfg.pooling, c.hidden_size)
    head = nn.Dense(mcfg.num_classes)
    stack = make_sp_stack(c, mesh, impl, seq_axis, data_axis)
    n_seq = mesh.shape[seq_axis]

    def forward(params, input_ids, attention_mask):
        S = input_ids.shape[1]
        if S % n_seq:
            raise ValueError(f"sequence length {S} not divisible by "
                             f"seq-axis size {n_seq}")
        x = enc.apply({"params": params["encoder"]}, input_ids,
                      attention_mask, method="embed")
        layer_params = {k: v for k, v in params["encoder"].items()
                        if k.startswith("layer_")}
        h = stack(layer_params, x, attention_mask.astype(jnp.float32))
        pooled = pooler.apply({"params": params.get("pooler", {})}, h,
                              attention_mask)
        return head.apply({"params": params["output"]}, pooled)

    return forward


def make_sp_apply_fn(mcfg: ModelConfig, mesh: Mesh, impl: str = "ring",
                     seq_axis: str = "seq", data_axis: str = "data"):
    """DRIVER-MODE apply_fn: the 2A ``TextClassifier`` forward with its
    layer stack sequence-sharded, pluggable into ``build_train_step_fn``
    (real focal/CE loss + valid masking + grouped-LR optimizer), the eval
    steps, TSV emission and checkpointing — ``train --seq-shards K``.

    Identical parameter tree to the plain ``TextClassifier``, so orbax
    checkpoints, MLM-pretrained splicing and ``predict`` restore work
    unchanged.  Embedding dropout runs live via the flax rng; encoder-layer
    dropout is DETERMINISTIC inside the SP region — the documented trade
    (MeshConfig.num_seq_shards).
    """
    c = mcfg.text
    enc = TextEncoder(c)
    pooler = Pooler(mcfg.pooling, c.hidden_size)
    head = nn.Dense(mcfg.num_classes)
    stack = make_sp_stack(c, mesh, impl, seq_axis, data_axis)
    n_seq = mesh.shape[seq_axis]

    def apply_fn(variables, batch, train, rngs, mutable):
        params = variables["params"]
        ids, mask = batch["text_ids"], batch["text_mask"]
        if ids.shape[1] % n_seq:
            raise ValueError(f"sequence length {ids.shape[1]} not divisible "
                             f"by seq-axis size {n_seq}")
        x = enc.apply({"params": params["encoder"]}, ids, mask,
                      deterministic=not train, method="embed",
                      rngs=rngs if train else None)
        layer_params = {k: v for k, v in params["encoder"].items()
                        if k.startswith("layer_")}
        h = stack(layer_params, x, mask.astype(jnp.float32))
        pooled = pooler.apply({"params": params.get("pooler", {})}, h, mask)
        return head.apply({"params": params["output"]}, pooled), {}

    return apply_fn


def place_sp_params(params, mesh: Mesh):
    """SP shards *activations*, not weights: params (and the optimizer state
    created from them) are replicated over the whole mesh."""
    return jax.device_put(params, NamedSharding(mesh, P()))


def make_sp_train_step(forward, tx):
    """Jitted CE train step over a sequence-parallel forward.

    ``step(params, opt_state, batch) -> (params, opt_state, loss)`` with the
    batch sharded on ``data``; gradients of the replicated weights come out
    of the shard_map transpose already psum-reduced over both mesh axes."""
    import optax

    def loss_fn(params, batch):
        logits = forward(params, batch["text_ids"], batch["text_mask"])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]).mean()

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
