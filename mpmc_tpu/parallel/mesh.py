"""Device mesh + sharding helpers (SPMD layer).

The reference has no distribution at all (SURVEY.md §2.3: single device, no
DDP, DataLoader num_workers=0).  The TPU build's parallelism is expressed
here, idiomatically: a ``jax.sharding.Mesh`` over the chips, the batch sharded
on a ``data`` axis, parameters replicated, and gradients averaged implicitly
by XLA's SPMD partitioner when the jitted train step consumes the sharded
batch.  An optional leading ``fold`` axis trains k cross-validation folds
simultaneously (stacked-weights harness, SURVEY.md §2.3).

Axis factoring note: on one host every axis rides ICI; the helpers keep axis
names stable so a multi-host ("dcn", "ici")-factored mesh drops in without
touching the train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpmc_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    exclusive = [("tensor-parallel", cfg.num_model_shards),
                 ("pipeline-parallel", cfg.num_stage_shards),
                 ("sequence-parallel", cfg.num_seq_shards)]
    active = [name for name, extent in exclusive if extent > 1]
    if len(active) > 1 or (active and cfg.is_fold_parallel):
        raise ValueError(
            "mutually exclusive parallelism modes requested: "
            + ", ".join(active + (["fold-parallel"]
                                  if cfg.is_fold_parallel else [])))
    if cfg.is_fold_parallel:
        if cfg.num_model_shards > 1:
            raise ValueError("fold-parallel and tensor-parallel are "
                             "mutually exclusive (MeshConfig)")
        if n % cfg.num_fold_shards:
            raise ValueError(
                f"{n} devices not divisible by {cfg.num_fold_shards} folds")
        shape = (cfg.num_fold_shards, n // cfg.num_fold_shards)
        return Mesh(np.asarray(devices).reshape(shape), cfg.axis_names())
    if cfg.num_model_shards > 1:
        # (data, model): the model axis is innermost so TP's two per-layer
        # all-reduces ride the fastest (adjacent-chip ICI) dimension.
        # num_data_shards <= 1 means "unspecified" → use the whole machine
        # rather than stranding devices beyond 1 x model.
        if cfg.num_data_shards > 1:
            dp = cfg.num_data_shards
        else:
            if n % cfg.num_model_shards:
                raise ValueError(
                    f"{n} devices not divisible by "
                    f"num_model_shards={cfg.num_model_shards}")
            dp = n // cfg.num_model_shards
        need = dp * cfg.num_model_shards
        if n < need:
            raise ValueError(f"{n} devices < data x model = {need}")
        shape = (dp, cfg.num_model_shards)
        return Mesh(np.asarray(devices[:need]).reshape(shape),
                    cfg.axis_names())
    for extent, label in ((cfg.num_stage_shards, "pipeline stages"),
                          (cfg.num_seq_shards, "sequence shards")):
        if extent > 1:
            # (data, stage) / (data, seq): like TP, the parallelism axis is
            # innermost so its per-layer collectives (neighbour ppermute /
            # all_to_all) ride adjacent-chip ICI.
            if cfg.num_data_shards > 1:
                dp = cfg.num_data_shards
            else:
                if n % extent:
                    raise ValueError(
                        f"{n} devices not divisible by {extent} {label}")
                dp = n // extent
            need = dp * extent
            if n < need:
                raise ValueError(f"{n} devices < data x {label} = {need}")
            return Mesh(np.asarray(devices[:need]).reshape(dp, extent),
                        cfg.axis_names())
    if cfg.num_data_shards > 1:
        if n < cfg.num_data_shards:
            raise ValueError(
                f"{n} devices < num_data_shards={cfg.num_data_shards}")
        devices = devices[:cfg.num_data_shards]
        n = cfg.num_data_shards
    return Mesh(np.asarray(devices).reshape(n), (cfg.data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-axis batch sharding (DP)."""
    return NamedSharding(mesh, P(data_axis))


def stacked_batch_sharding(mesh: Mesh, data_axis: str = "data"
                           ) -> NamedSharding:
    """Sharding for a scan-fused [K, B, ...] batch stack: the leading axis
    is the scan (time) axis and must stay whole on every device; the batch
    axis (axis 1) shards over the data axis (train.step.make_scan_train_step)."""
    return NamedSharding(mesh, P(None, data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a pytree of host arrays on the mesh, batch-sharded on axis 0."""
    sh = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
