"""Tensor parallelism: Megatron-style weight sharding over a `model` axis.

The reference has no parallelism at all (SURVEY.md §2.3); at its model
sizes (110-135M-param encoders) DP is the right layout, so TP here is the
scaling path for larger drop-in encoders, not the default.  The design is
pure SPMD: parameters (and the optimizer state mirroring them) are placed
with `NamedSharding`s chosen by path-matching rules, the jitted train step
is left untouched, and XLA's partitioner inserts the two all-reduces per
transformer layer (after attention-out and after MLP-out) over ICI.

Rules target the flax param tree of `models/bert.py` (AraBERT / QARiB /
RoBERTa / DistilBERT encoders — the repo's transformer family):

===================================  =========  ====================
path suffix                          shape      PartitionSpec
===================================  =========  ====================
attention/{query,key,value}/kernel   [D,H,dh]   (None, model, None)
attention/{query,key,value}/bias     [H,dh]     (model, None)
attention/out/kernel                 [H,dh,D]   (model, None, None)
intermediate/kernel                  [D,F]      (None, model)
intermediate/bias                    [F]        (model,)
output/kernel (layer MLP out)        [F,D]      (model, None)
word_embeddings/embedding            [V,D]      (model, None)
everything else                      any        replicated
===================================  =========  ====================

`num_model_shards` must divide the sharded dimension (heads H, MLP hidden
F, vocab V); a leaf where it doesn't — or whose rank doesn't match the
rule — replicates with a warning instead of erroring, so correctness never
depends on a rule applying.  With the head axis sharded, attention must
run the XLA implementation (the Pallas kernel is an opaque custom call the
partitioner cannot split) — the driver sets
`ops.attention.set_default_impl("xla")` when TP is active.
"""

from __future__ import annotations

import logging
import re
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpmc_tpu.utils.tree import path_str as _path_str

log = logging.getLogger(__name__)

# (path-suffix regex, spec builder). Specs reference the model axis by name;
# order matters — first match wins.
_TP_RULES = (
    (re.compile(r"attention/(query|key|value)/kernel$"),
     lambda ax: P(None, ax, None)),
    (re.compile(r"attention/(query|key|value)/bias$"),
     lambda ax: P(ax, None)),
    (re.compile(r"attention/out/kernel$"), lambda ax: P(ax, None, None)),
    (re.compile(r"intermediate/kernel$"), lambda ax: P(None, ax)),
    (re.compile(r"intermediate/bias$"), lambda ax: P(ax)),
    # Anchored to encoder layers: bare Dense heads named "output"
    # (models/classifier.py) are tiny and must NOT pick up a row-shard +
    # per-step all-reduce.
    (re.compile(r"layer_\d+/output/kernel$"), lambda ax: P(ax, None)),
    # Vocab-parallel word embeddings: the tables are the largest tensors in
    # the flagship (AraBERT 64k + RoBERTa 50k vocab ≈ 124M of 275M params);
    # sharding the vocab dim cuts per-chip HBM by that term and XLA
    # partitions the lookup (masked local take + all-reduce) itself.
    (re.compile(r"word_embeddings/embedding$"), lambda ax: P(ax, None)),
    # ViT family (models/vit.py): q/k/v [D,H,dh], out [H,dh,D],
    # mlp1 [D,F], mlp2 [F,D] inside layer_N blocks.
    (re.compile(r"layer_\d+/(q|k|v)/kernel$"), lambda ax: P(None, ax, None)),
    (re.compile(r"layer_\d+/(q|k|v)/bias$"), lambda ax: P(ax, None)),
    (re.compile(r"layer_\d+/out/kernel$"), lambda ax: P(ax, None, None)),
    (re.compile(r"layer_\d+/mlp1/kernel$"), lambda ax: P(None, ax)),
    (re.compile(r"layer_\d+/mlp1/bias$"), lambda ax: P(ax)),
    (re.compile(r"layer_\d+/mlp2/kernel$"), lambda ax: P(ax, None)),
)


def spec_for_path(path, model_axis: str = "model") -> P:
    """PartitionSpec for one param/optimizer-state leaf path (replicated
    when no TP rule matches).  Optimizer-state leaves mirror the param tree
    (optax adam mu/nu), so suffix matching covers them too."""
    s = _path_str(path)
    for pat, build in _TP_RULES:
        if pat.search(s):
            return build(model_axis)
    return P()


def shard_state(state, mesh: Mesh, model_axis: str = "model",
                leading_axes: tuple = ()):
    """Place a TrainState (params + mirrored optimizer state + scalars) on
    the mesh with Megatron TP shardings; non-matching leaves replicate.

    Leaves whose sharded dimension does not divide the mesh extent fall
    back to replication with a warning (e.g. a fusion head whose width is
    not a multiple of the model-axis size) — correctness never depends on
    a rule matching.

    ``leading_axes`` composes TP with stacked-leading-dim layouts: e.g.
    ``("fold",)`` for fold-parallel stacked states ([F, ...] leaves) shards
    dim 0 over ``fold`` AND the rule's dims (shifted right by one) over
    ``model`` — the 3-D ``(fold, data, model)`` mesh."""
    axis_size = mesh.shape[model_axis]
    lead = tuple(leading_axes)

    def place(path, x):
        spec = spec_for_path(path, model_axis)
        if lead:
            spec = P(*lead, *spec) if spec != P() else P(*lead)
        if any(ax == model_axis for ax in spec if ax is not None):
            if getattr(x, "ndim", 0) < len(spec):
                # A lower-rank leaf at a matching path — e.g. factored-RMS
                # v_row/v_col accumulators [H]/[V] under
                # word_embeddings/embedding.  Expected; replicate quietly.
                log.debug("tp: %s rank %d < rule rank %d — replicating",
                          _path_str(path), getattr(x, "ndim", 0), len(spec))
                spec = P(*lead) if lead else P()
            else:
                for dim, name in enumerate(spec):
                    if name == model_axis and x.shape[dim] % axis_size:
                        log.warning(
                            "tp: %s shape %s not divisible by %s=%d — "
                            "replicating", _path_str(path),
                            getattr(x, "shape", ()), model_axis, axis_size)
                        spec = P(*lead) if lead else P()
                        break
        if lead and getattr(x, "ndim", 0) < len(lead):
            spec = P()  # scalars (step counters) can't carry the fold axis
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)


def count_sharded(state, model_axis: str = "model") -> int:
    """Number of leaves actually sharded over the model axis (diagnostic /
    test hook)."""
    n = 0
    for leaf in jax.tree_util.tree_leaves(state):
        sh = getattr(leaf, "sharding", None)
        spec = getattr(sh, "spec", None)
        if spec and any(ax == model_axis for ax in spec if ax is not None):
            n += 1
    return n


def maybe_force_xla_attention(num_model_shards: int) -> Optional[str]:
    """With the head axis sharded, the Pallas attention kernel (an opaque
    custom call) cannot be partitioned by XLA — force the einsum path the
    SPMD partitioner understands. Returns the impl that was set."""
    if num_model_shards > 1:
        from mpmc_tpu.ops.attention import set_default_impl
        set_default_impl("xla")
        return "xla"
    return None
