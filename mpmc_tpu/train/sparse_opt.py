"""Sparse (lazy) row-Adam for the word-embedding tables.

The flagship step is optimizer-HBM-bound (BREAKDOWN.json: the grouped-Adam
read-modify-write alone is ~14 ms of a 38 ms bs16 step against a ~9.4 ms
pure-HBM floor), and ~45% of the parameter mass is the [vocab, hidden]
word-embedding tables — whose per-step gradient support is only the batch's
token ids (≤ ~3k rows of 64k).  Dense Adam still reads and writes all seven
f32 passes over those tables every step.

This module updates the tables lazily, torch ``SparseAdam``-style:

* the touched-row support is derived from the gradient itself (row L1 > 0)
  and extracted as a STATIC-size index set via ``lax.top_k`` (XLA needs
  static shapes; ``support_rows`` bounds the per-step support — the batch's
  token count, so the driver can size it exactly);
* mu/nu/param rows are gathered at those indices, the EXACT Adam update
  (global-step bias correction, same b1/b2/eps) is applied to them, and the
  new mu/nu rows are scattered back — K-row traffic instead of full-table;
* untouched rows are frozen: no momentum decay, no parameter drift.  This
  is the standard lazy-Adam semantics (torch ``SparseAdam``, TF
  ``LazyAdamOptimizer``) — NOT bit-equal to dense Adam for zero-gradient
  rows (dense Adam keeps moving them on decaying momentum), but exactly
  equal on every touched row, and exactly equal everywhere when every row
  is touched each step (parity-tested both ways in
  tests/test_sparse_opt.py).

The one full-table pass that remains is reading the dense gradient XLA
materializes in the backward (the row-norm reduction); everything else is
K rows.  The update is returned as a :class:`SparseRows` leaf so the final
parameter write is a K-row scatter-add into the donated buffer — use this
module's :func:`apply_updates` (a drop-in for ``optax.apply_updates``).

Replaces nothing in the reference (it has no optimizer-sparsity anywhere —
plain ``torch.optim.Adam`` over all params,
``Multimodal_example_task2C.py:168``); this is a TPU-roofline lever the
round-3 breakdown identified.  Opt-in via ``--embedding-optimizer sparse``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mpmc_tpu.utils.tree import path_str


class SparseRows(struct.PyTreeNode):
    """A parameter update touching only ``idx`` rows of a 2-D table.

    ``idx`` [K] int32 (out-of-range entries mark padding and are dropped on
    scatter); ``rows`` [K, H] f32 — the signed deltas to add.
    """

    idx: jax.Array
    rows: jax.Array


def apply_updates(params: Any, updates: Any) -> Any:
    """``optax.apply_updates`` that also understands :class:`SparseRows`
    leaves: those become a K-row scatter-add (in-place on donated buffers)
    instead of a full-table elementwise add."""

    def apply_one(p, u):
        if isinstance(u, SparseRows):
            return p.at[u.idx].add(u.rows.astype(p.dtype), mode="drop")
        if u is None:
            return p
        return (p + u.astype(p.dtype)).astype(p.dtype)

    # tree_map flattens over params' structure; flatten_up_to hands back the
    # whole SparseRows node at positions where params has an array leaf.
    return jax.tree_util.tree_map(apply_one, params, updates)


class SparseEmbedState(NamedTuple):
    inner: Any
    count: jax.Array
    mu: Any   # embed-leaf-only trees (optax.MaskedNode elsewhere)
    nu: Any


def _sparse_leaf_update(g, mu, nu, lr, t, b1, b2, eps, support_rows):
    """Lazy Adam on one [V, H] table: exact Adam math on the ≤K touched
    rows, frozen elsewhere.  Returns (SparseRows update, new mu, new nu)."""
    V = g.shape[0]
    K = min(int(support_rows), V)
    g = g.astype(jnp.float32)
    row_norm = jnp.sum(jnp.abs(g), axis=1)
    vals, idx = jax.lax.top_k(row_norm, K)
    valid = (vals > 0)[:, None]
    # Invalid (zero-gradient) slots scatter nowhere: index V is dropped.
    idx_safe = jnp.where(valid[:, 0], idx, V)
    g_rows = g[idx]
    new_mu = b1 * mu[idx] + (1.0 - b1) * g_rows
    new_nu = b2 * nu[idx] + (1.0 - b2) * g_rows * g_rows
    tf = t.astype(jnp.float32)
    mhat = new_mu / (1.0 - b1 ** tf)
    vhat = new_nu / (1.0 - b2 ** tf)
    upd = (-lr * mhat / (jnp.sqrt(vhat) + eps)).astype(jnp.float32)
    mu_out = mu.at[idx_safe].set(jnp.where(valid, new_mu, 0.0), mode="drop")
    nu_out = nu.at[idx_safe].set(jnp.where(valid, new_nu, 0.0), mode="drop")
    return (SparseRows(idx=idx_safe, rows=jnp.where(valid, upd, 0.0)),
            mu_out, nu_out)


def with_sparse_embeddings(
        inner: optax.GradientTransformation,
        learning_rate: optax.Schedule,
        support_rows: int,
        is_embed: Callable[[str], bool] = lambda p: "word_embeddings" in p,
        b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Wrap ``inner`` (which must pass embed-leaf gradients through
    unchanged — give them ``optax.identity()`` in its multi_transform) so
    embed leaves get the lazy row-Adam update as :class:`SparseRows`.

    The produced updates tree is only consumable by this module's
    :func:`apply_updates`.  ``support_rows`` must be ≥ the number of
    distinct vocab rows any single step touches (tokens per batch bounds
    it); overflowing rows with the smallest gradient norms would be
    silently skipped that step, so drivers size it from the batch shape.
    """

    def _embed_2d(path, p) -> bool:
        return is_embed(path_str(path)) and getattr(p, "ndim", 0) == 2

    def init(params):
        mu = jax.tree_util.tree_map_with_path(
            lambda pth, p: jnp.zeros_like(p, jnp.float32)
            if _embed_2d(pth, p) else optax.MaskedNode(), params)
        return SparseEmbedState(inner=inner.init(params),
                                count=jnp.zeros((), jnp.int32),
                                mu=mu, nu=jax.tree_util.tree_map(jnp.copy, mu))

    def update(updates, state, params=None):
        inner_up, inner_state = inner.update(updates, state.inner, params)
        # optax schedule convention: step t consumes schedule(count), then
        # count increments (matches optax.scale_by_schedule).
        lr = learning_rate(state.count)
        t = state.count + 1
        flat, treedef = jax.tree_util.tree_flatten_with_path(inner_up)
        mu_list = treedef.flatten_up_to(state.mu)
        nu_list = treedef.flatten_up_to(state.nu)
        out_u, out_mu, out_nu = [], [], []
        for (path, u), mu, nu in zip(flat, mu_list, nu_list):
            if _embed_2d(path, u):
                s, m2, n2 = _sparse_leaf_update(
                    u, mu, nu, lr, t, b1, b2, eps, support_rows)
                out_u.append(s)
                out_mu.append(m2)
                out_nu.append(n2)
            else:
                out_u.append(u)
                out_mu.append(mu)
                out_nu.append(nu)
        unf = jax.tree_util.tree_unflatten
        return (unf(treedef, out_u),
                SparseEmbedState(inner=inner_state, count=t,
                                 mu=unf(treedef, out_mu),
                                 nu=unf(treedef, out_nu)))

    return optax.GradientTransformation(init, update)
