"""Fold-parallel training: k cross-validation folds as one SPMD program.

The reference trains its 5 folds sequentially (``Multimodal_example_task2C.py:
882-885``) and its 10 2A folds as separate OS processes
(``textmodel_example_task2A.py:186-192``).  On a TPU slice the idiomatic
version is a 2-D mesh ``(fold, data)``: parameters are stacked on a leading
fold axis and sharded over mesh axis ``fold``, each fold's batch is sharded
over ``data``, and the per-fold train step is ``vmap``-ed over the stack —
one jitted program trains all folds simultaneously, with the gradient
all-reduce riding ICI inside each fold's data-parallel group and zero
communication between folds.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpmc_tpu.train.step import TrainState


def stack_states(states) -> TrainState:
    """Stack per-fold TrainStates on a new leading fold axis."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *states)


def unstack_state(stacked: TrainState, fold: int) -> TrainState:
    return jax.tree_util.tree_map(lambda x: x[fold], stacked)


def make_fold_parallel_train_step(step_fn: Callable, mesh: Mesh,
                                  fold_axis: str = "fold",
                                  data_axis: str = "data"):
    """vmap ``step_fn(state, batch, rng) -> (state, metrics)`` over a leading
    fold axis and jit it with fold/data shardings.

    Inputs: state leaves [F, ...] (sharded on ``fold``), batch leaves
    [F, B, ...] (sharded on ``(fold, data)``), rng keys [F] (sharded ``fold``).
    """
    vstep = jax.vmap(step_fn)
    state_sh = NamedSharding(mesh, P(fold_axis))
    batch_sh = NamedSharding(mesh, P(fold_axis, data_axis))
    return jax.jit(
        vstep,
        in_shardings=(state_sh, batch_sh, state_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,),
    )


def make_fold_parallel_scan_train_step(step_fn: Callable, mesh: Mesh,
                                       scan_steps: int,
                                       fold_axis: str = "fold",
                                       data_axis: str = "data"):
    """Scan-fused fold-parallel step: K optimizer steps for ALL folds in one
    dispatch (``lax.scan`` over the vmapped per-fold step — the same launch
    amortization as train.step.make_scan_train_step, composed with the fold
    axis).

    Inputs: state leaves [F, ...] (sharded ``fold``), batch leaves
    [K, F, B, ...] (sharded ``(None, fold, data)``), rng keys [K, F]
    (sharded ``(None, fold)``).  Metrics come back stacked [K, F].
    """
    if scan_steps < 2:
        raise ValueError(f"scan_steps must be >= 2, got {scan_steps}")
    vstep = jax.vmap(step_fn)
    state_sh = NamedSharding(mesh, P(fold_axis))
    batch_sh = NamedSharding(mesh, P(None, fold_axis, data_axis))
    keys_sh = NamedSharding(mesh, P(None, fold_axis))

    def scan_fn(states, batches, keys):
        def body(st, xs):
            b, kk = xs
            return vstep(st, b, kk)

        return jax.lax.scan(body, states, (batches, keys))

    # metrics come back [K, F]: the fold axis is dim 1, the scan axis whole
    metrics_sh = NamedSharding(mesh, P(None, fold_axis))
    return jax.jit(scan_fn, in_shardings=(state_sh, batch_sh, keys_sh),
                   out_shardings=(state_sh, metrics_sh), donate_argnums=(0,))


def make_fold_parallel_gather_scan_step(step_fn: Callable, mesh: Mesh,
                                        scan_steps: int,
                                        fold_axis: str = "fold",
                                        data_axis: str = "data"):
    """Device-resident + scan-fused fold-parallel: the dataset pytree lives
    in HBM (replicated across the mesh) and each dispatch ships only
    ``idx [K, F, B]`` int32 rows + ``valid [K, F, B]`` — each fold gathers
    its own batch on device, then the vmapped step advances all folds, K
    times per launch."""
    if scan_steps < 1:
        raise ValueError(f"scan_steps must be >= 1, got {scan_steps}")

    def fold_step(state, data, idx, valid, key):
        batch = jax.tree_util.tree_map(lambda a: a[idx], data)
        batch["valid"] = valid
        return step_fn(state, batch, key)

    vstep = jax.vmap(fold_step, in_axes=(0, None, 0, 0, 0))
    state_sh = NamedSharding(mesh, P(fold_axis))
    repl = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(None, fold_axis, data_axis))
    keys_sh = NamedSharding(mesh, P(None, fold_axis))

    def scan_fn(states, data, idx, valid, keys):
        def body(st, xs):
            ib, vb, kk = xs
            return vstep(st, data, ib, vb, kk)

        return jax.lax.scan(body, states, (idx, valid, keys))

    # metrics come back [K, F]: the fold axis is dim 1, the scan axis whole
    metrics_sh = NamedSharding(mesh, P(None, fold_axis))
    return jax.jit(scan_fn,
                   in_shardings=(state_sh, repl, idx_sh, idx_sh, keys_sh),
                   out_shardings=(state_sh, metrics_sh), donate_argnums=(0,))


def make_fold_parallel_eval_step(eval_fn: Callable, mesh: Mesh,
                                 fold_axis: str = "fold",
                                 data_axis: str = "data"):
    vstep = jax.vmap(eval_fn)
    state_sh = NamedSharding(mesh, P(fold_axis))
    batch_sh = NamedSharding(mesh, P(fold_axis, data_axis))
    return jax.jit(vstep, in_shardings=(state_sh, batch_sh),
                   out_shardings=state_sh)


def make_fold_parallel_gather_eval_step(eval_fn: Callable, mesh: Mesh,
                                        fold_axis: str = "fold",
                                        per_fold_idx: bool = False):
    """Eval all folds over one device-resident batch.

    ``per_fold_idx=False``: ``idx [B]`` rows of the resident test split,
    shared across folds (the 2C CV pattern — common dev split, SURVEY.md
    C20).  ``per_fold_idx=True``: ``idx [F, B]`` — each fold gathers its OWN
    rows, which is how the 2A per-fold held-out eval scores each fold on its
    validation split without leaking its training rows."""

    def fold_eval(state, data, idx):
        return eval_fn(state, jax.tree_util.tree_map(lambda a: a[idx], data))

    vstep = jax.vmap(fold_eval,
                     in_axes=(0, None, 0 if per_fold_idx else None))
    state_sh = NamedSharding(mesh, P(fold_axis))
    repl = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(fold_axis)) if per_fold_idx else repl
    return jax.jit(vstep, in_shardings=(state_sh, repl, idx_sh),
                   out_shardings=state_sh)
