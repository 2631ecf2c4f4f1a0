"""Pipeline parallelism: GPipe-schedule stage sharding over a ``stage`` axis.

The reference has no parallelism at all (SURVEY.md §2.3) and its encoders
(110-135M params) fit comfortably on one chip, so — like tensor parallelism
(``parallel/tp.py``) — this is the scaling path for larger drop-in encoders,
not the default layout.  The design is the idiomatic JAX/TPU pipeline:

* the transformer ``layer_i`` stack of ``models/bert.py`` is split into
  ``S`` contiguous stages; each stage's ``L/S`` layer param trees are
  stacked on a leading axis and the stage stack is sharded over mesh axis
  ``stage`` — each device (row) holds only its own stage's weights, so
  per-chip parameter HBM scales as 1/S;
* the forward is a ``shard_map`` over the mesh: a ``lax.scan`` over
  ``M + S - 1`` schedule ticks, where stage ``s`` processes microbatch
  ``t - s`` at tick ``t`` and hands its activation to stage ``s+1`` with a
  single neighbour ``lax.ppermute`` per tick (ICI nearest-neighbour — no
  all-to-all, no host involvement);
* the backward is **not hand-written**: ``jax.grad`` differentiates through
  ``shard_map``/``scan``/``ppermute`` (the transpose of a forward neighbour
  shift is the reverse shift), so the reverse pipeline schedule falls out of
  the autodiff transpose, exactly the compiler-first design SURVEY §7 asks
  for;
* embeddings, pooling and the classifier head are tiny next to the stack
  and run replicated outside the pipelined region; the batch axis may
  additionally be sharded over a ``data`` mesh axis, composing PP x DP on a
  2-D ``(data, stage)`` mesh.

Bubble accounting (GPipe): of ``M + S - 1`` ticks, ``S - 1`` are bubble, so
efficiency is ``M / (M + S - 1)`` — callers pick ``M >= 4*S`` when
throughput matters.  Layer dropout runs deterministic inside the pipelined
region (embedding/head dropout is unaffected); fine-tuning at reference
scale uses the DP/TP paths, and the parity tests pin PP against the plain
forward in deterministic mode.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpmc_tpu.config import ModelConfig
from mpmc_tpu.models.bert import EncoderLayer, TextEncoder
from mpmc_tpu.models.pooling import Pooler


def split_stage_params(params, num_stages: int) -> Tuple[dict, dict]:
    """Split a ``TextClassifier`` param tree into (rest, stage_stack).

    ``rest`` is the tree with ``encoder/layer_i`` removed (embeddings,
    encoder pooler, classifier pooler/head); ``stage_stack`` leaves are
    ``[S, L/S, ...]`` — stage-major stacking of the encoder layers in
    order, so stage ``s`` owns layers ``s*L/S .. (s+1)*L/S - 1``.
    """
    enc = dict(params["encoder"])
    layer_keys = sorted((k for k in enc if k.startswith("layer_")),
                        key=lambda k: int(k.split("_")[1]))
    num_layers = len(layer_keys)
    if num_layers == 0 or num_layers % num_stages:
        raise ValueError(f"{num_layers} encoder layers not divisible into "
                         f"{num_stages} stages")
    per = num_layers // num_stages
    layers = [enc.pop(k) for k in layer_keys]

    def stack(trees):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    stage_stack = stack([stack(layers[s * per:(s + 1) * per])
                         for s in range(num_stages)])
    rest = {**params, "encoder": enc}
    return rest, stage_stack


def merge_stage_params(rest: dict, stage_stack) -> dict:
    """Inverse of :func:`split_stage_params` — rebuild the flat
    ``TextClassifier`` tree (checkpoint interop, parity tests)."""
    leaves = jax.tree_util.tree_leaves(stage_stack)
    num_stages, per = leaves[0].shape[0], leaves[0].shape[1]
    enc = dict(rest["encoder"])
    for s in range(num_stages):
        for j in range(per):
            enc[f"layer_{s * per + j}"] = jax.tree_util.tree_map(
                lambda x: x[s, j], stage_stack)
    return {**rest, "encoder": enc}


def make_pipeline_fn(text_cfg, mesh: Mesh, num_stages: int,
                     num_microbatches: int, attn_impl: str = "auto",
                     stage_axis: str = "stage", data_axis: str = "data"):
    """shard_map'd pipelined layer stack.

    Signature of the returned fn:
      ``(stage_stack, xs [M, b, S_seq, D], masks [M, b, S_seq]) -> [M, b,
      S_seq, D]``
    with ``stage_stack`` sharded ``P(stage)``, activations sharded on the
    batch axis over ``data`` and replicated over ``stage``.
    """
    S, M = num_stages, num_microbatches
    layer = EncoderLayer(text_cfg, attn_impl)

    def apply_stage(stage_params, x, mask):
        # Sequentially apply this stage's L/S layers (scan over the stacked
        # layer axis; deterministic inside the pipelined region).
        def body(h, p):
            return layer.apply({"params": p}, h, mask, True), None

        x, _ = jax.lax.scan(body, x, stage_params)
        return x

    def pipeline(stage_stack, xs, masks):
        # Local views: stage_stack leaves [1, L/S, ...]; xs/masks full
        # microbatch stacks (replicated over `stage`, sharded over `data`).
        local = jax.tree_util.tree_map(lambda a: jnp.squeeze(a, 0),
                                       stage_stack)
        s = jax.lax.axis_index(stage_axis)
        num_ticks = M + S - 1
        # The carry is device-varying over `stage` from tick 1 on; mark the
        # (zero) initial carry as varying so scan's type check agrees.
        state = jax.lax.pcast(jnp.zeros_like(xs[0]), (stage_axis,),
                              to="varying")
        outbuf = jax.lax.pcast(jnp.zeros_like(xs), (stage_axis,),
                               to="varying")

        def tick(carry, t):
            state, outbuf = carry
            # Stage s works on microbatch t - s (clamped during bubble
            # ticks — those results are masked out below).
            mu = jnp.clip(t - s, 0, M - 1)
            x_in = jnp.where(s == 0, jnp.take(xs, mu, axis=0), state)
            mask = jnp.take(masks, mu, axis=0)
            y = apply_stage(local, x_in, mask)
            # The last stage commits microbatch t-(S-1) at tick t.
            widx = jnp.clip(t - (S - 1), 0, M - 1)
            commit = jnp.logical_and(s == S - 1, t >= S - 1)
            prev = jnp.take(outbuf, widx, axis=0)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(commit, y, prev), widx, 0)
            if S > 1:
                # Neighbour shift s -> s+1 over ICI.
                state = jax.lax.ppermute(
                    y, stage_axis, [(i, i + 1) for i in range(S - 1)])
            return (state, outbuf), None

        (_, outbuf), _ = jax.lax.scan(tick, (state, outbuf),
                                      jnp.arange(num_ticks))
        # Only the last stage's buffer holds real outputs; one psum
        # broadcasts it so the (replicated) head can consume it anywhere.
        outbuf = jnp.where(s == S - 1, outbuf, jnp.zeros_like(outbuf))
        return jax.lax.psum(outbuf, stage_axis)

    return jax.shard_map(
        pipeline, mesh=mesh,
        in_specs=(P(stage_axis), P(None, data_axis), P(None, data_axis)),
        out_specs=P(None, data_axis))


def make_pp_forward(mcfg: ModelConfig, mesh: Mesh, num_stages: int,
                    num_microbatches: int, attn_impl: str = "auto",
                    stage_axis: str = "stage", data_axis: str = "data"):
    """Full 2A text-classifier forward with the layer stack pipelined.

    ``forward(rest, stage_stack, input_ids, attention_mask) -> logits`` —
    numerically identical (deterministic mode) to
    ``TextClassifier(mcfg).apply`` on the merged tree.
    """
    M = num_microbatches
    enc = TextEncoder(mcfg.text, attn_impl)
    pooler = Pooler(mcfg.pooling, mcfg.text.hidden_size)
    head = nn.Dense(mcfg.num_classes)
    pipeline = make_pipeline_fn(mcfg.text, mesh, num_stages, M, attn_impl,
                                stage_axis, data_axis)

    def forward(rest, stage_stack, input_ids, attention_mask):
        B, S_seq = input_ids.shape
        if B % M:
            raise ValueError(f"batch {B} not divisible by "
                             f"num_microbatches={M}")
        x = enc.apply({"params": rest["encoder"]}, input_ids,
                      attention_mask, method="embed")
        xs = x.reshape(M, B // M, S_seq, x.shape[-1])
        masks = attention_mask.astype(jnp.float32).reshape(M, B // M, S_seq)
        h = pipeline(stage_stack, xs, masks).reshape(B, S_seq, x.shape[-1])
        pooled = pooler.apply({"params": rest.get("pooler", {})}, h,
                              attention_mask)
        return head.apply({"params": rest["output"]}, pooled)

    return forward


def make_pp_apply_fn(mcfg: ModelConfig, mesh: Mesh, num_stages: int,
                     num_microbatches: int, attn_impl: str = "auto",
                     stage_axis: str = "stage", data_axis: str = "data"):
    """DRIVER-MODE apply_fn: the 2A ``TextClassifier`` forward with its
    layer stack pipelined, pluggable into ``build_train_step_fn`` (real
    focal/CE loss + valid masking + grouped-LR optimizer), the eval steps,
    TSV emission and checkpointing — ``train --pipeline-stages K``.

    The variables carry the SPLIT tree ``{"rest": ..., "stages": ...}``
    (``split_stage_params``; each stage row holds 1/S of the encoder —
    that 1/S per-chip HBM is the point of PP, so the stacked layout IS the
    checkpoint layout; ``merge_stage_params`` converts back for plain
    restore).  Embedding dropout runs live via the flax rng; encoder-layer
    dropout is DETERMINISTIC inside the pipelined region — the documented
    trade (MeshConfig.num_stage_shards).
    """
    M = num_microbatches
    enc = TextEncoder(mcfg.text, attn_impl)
    pooler = Pooler(mcfg.pooling, mcfg.text.hidden_size)
    head = nn.Dense(mcfg.num_classes)
    pipeline = make_pipeline_fn(mcfg.text, mesh, num_stages, M, attn_impl,
                                stage_axis, data_axis)

    def apply_fn(variables, batch, train, rngs, mutable):
        params = variables["params"]
        rest, stages = params["rest"], params["stages"]
        ids, mask = batch["text_ids"], batch["text_mask"]
        B, S_seq = ids.shape
        if B % M:
            raise ValueError(f"batch {B} not divisible by "
                             f"num_microbatches={M}")
        x = enc.apply({"params": rest["encoder"]}, ids, mask,
                      deterministic=not train, method="embed",
                      rngs=rngs if train else None)
        xs = x.reshape(M, B // M, S_seq, x.shape[-1])
        masks = mask.astype(jnp.float32).reshape(M, B // M, S_seq)
        h = pipeline(stages, xs, masks).reshape(B, S_seq, x.shape[-1])
        pooled = pooler.apply({"params": rest.get("pooler", {})}, h, mask)
        return head.apply({"params": rest["output"]}, pooled), {}

    return apply_fn


def place_pp_params(rest: dict, stage_stack, mesh: Mesh,
                    stage_axis: str = "stage"):
    """Device placement: stage stack sharded ``P(stage)`` (each stage row
    holds 1/S of the transformer), everything else replicated.  Optimizer
    state created from these placed params under jit inherits the same
    layout via sharding propagation."""
    repl = NamedSharding(mesh, P())
    rest = jax.device_put(rest, repl)
    stage_stack = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(stage_axis))),
        stage_stack)
    return rest, stage_stack


def make_pp_train_step(forward, tx):
    """Jitted CE train step over the split param tree.

    ``step({'rest','stages'}, opt_state, batch) -> (params, opt_state,
    loss)``; create ``opt_state = tx.init(params)`` **eagerly** from
    *placed* params — eager zeros_like follows each leaf's committed
    NamedSharding, so mu/nu inherit the stage layout (a bare
    ``jax.jit(tx.init)`` would collapse them to one device)."""
    import optax

    def loss_fn(params, batch):
        logits = forward(params["rest"], params["stages"],
                         batch["text_ids"], batch["text_mask"])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]).mean()

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
