"""Attention core: Pallas TPU kernel with an XLA fallback.

Replaces the torch/cuDNN attention inside the reference's HF encoders (all of
L4, SURVEY.md §2.2).  Sequence lengths here are fixed and ≤512 with head dim
64, so an entire (batch, head) attention slice — Q/K/V tiles and the S×S score
matrix — fits comfortably in VMEM; the kernel therefore runs one (b, h) pair
per grid step, computing scores in f32 on the MXU, a masked numerically-stable
softmax on the VPU, and the value contraction, with zero HBM round-trips for
the S×S intermediate (the usual bandwidth cost of unfused attention).

The backward pass is a second Pallas kernel over saved (out, lse) residuals —
the standard flash-attention backward algebra — wired up via jax.custom_vjp.

Layout: q/k/v are [B, S, H, D] (flax convention); key-padding mask is [B, S]
with 1 = attend.  Cross-attention (different q/kv lengths) is supported.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9  # matches the reference's additive mask (-1e9), not -inf


# ---------------------------------------------------------------------------
# XLA reference path (also the CPU/test path)
# ---------------------------------------------------------------------------

def _attention_xla(q, k, v, mask, scale):
    # q: [B,Sq,H,D], k/v: [B,Sk,H,D], mask: [B,Sk] or None
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * _NEG_INF
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale):
    # Matmuls take the refs' native dtype (bf16 under the train policy) so the
    # MXU runs at full bf16 rate; accumulation and softmax stay f32.
    q = q_ref[0, 0]                              # [Sq, D]
    k = k_ref[0, 0]                              # [Sk, D]
    v = v_ref[0, 0]                              # [Sk, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + (1.0 - mask_ref[0, 0].astype(jnp.float32))[None, :] * _NEG_INF
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0, 0] = (m[:, 0] + jnp.log(denom[:, 0]))


def _fwd_pallas(q, k, v, mask, scale):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    qt = jnp.transpose(q, (0, 2, 1, 3))  # [B,H,Sq,D]
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if mask is None:
        mask = jnp.ones((B, Sk), dtype=jnp.float32)
    grid = (B, H)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Sq, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sk), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Sq, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Sq), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Sq), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Sq * Sk * D,
            bytes_accessed=(B * H * (Sq + 2 * Sk) * D * q.dtype.itemsize
                            + B * H * Sq * D * q.dtype.itemsize),
            transcendentals=B * H * Sq * Sk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qt, kt, vt, mask.astype(jnp.float32)[:, None, :])
    return jnp.transpose(out, (0, 2, 1, 3)), lse


# ---------------------------------------------------------------------------
# Pallas backward
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0]
    do_f32 = do.astype(jnp.float32)
    lse = lse_ref[0, 0, 0]                        # [Sq]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + (1.0 - mask_ref[0, 0].astype(jnp.float32))[None, :] * _NEG_INF
    p = jnp.exp(s - lse[:, None])                 # [Sq, Sk] f32
    p_lo = p.astype(v.dtype)
    # dv = P^T dO
    dv_ref[0, 0] = jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dP = dO V^T ; dS = P * (dP - rowsum(dO * O))
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(do_f32 * o, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq_ref[0, 0] = jnp.dot(ds, k, preferred_element_type=jnp.float32
                           ).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bwd_pallas(scale, residuals, g):
    q, k, v, mask, out, lse = residuals
    do, = (g,) if not isinstance(g, tuple) else (g[0],)
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    ot = jnp.transpose(out, (0, 2, 1, 3))
    dot = jnp.transpose(do, (0, 2, 1, 3))
    if mask is None:
        mask_arr = jnp.ones((B, Sk), dtype=jnp.float32)
    else:
        mask_arr = mask.astype(jnp.float32)
    spec_q = pl.BlockSpec((1, 1, Sq, D), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, 1, Sk, D), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(B, H),
        in_specs=[
            spec_q, spec_k, spec_k,
            pl.BlockSpec((1, 1, Sk), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_q,
            pl.BlockSpec((1, 1, 1, Sq), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_q,
        ],
        out_specs=[spec_q, spec_k, spec_k],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, Sk, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qt, kt, vt, mask_arr[:, None, :], ot, lse, dot)
    return (jnp.transpose(dq, (0, 2, 1, 3)),
            jnp.transpose(dk, (0, 2, 1, 3)),
            jnp.transpose(dv, (0, 2, 1, 3)),
            None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_pallas(q, k, v, mask, scale):
    out, _ = _fwd_pallas(q, k, v, mask, scale)
    return out


def _attention_pallas_fwd(q, k, v, mask, scale):
    out, lse = _fwd_pallas(q, k, v, mask, scale)
    return out, (q, k, v, mask, out, lse)


_attention_pallas.defvjp(_attention_pallas_fwd, _bwd_pallas)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

_DEFAULT_IMPL: Optional[str] = None


def set_default_impl(impl: Optional[str]) -> None:
    """Override 'auto' resolution globally — e.g. force 'xla' when running a
    CPU-device mesh while the process default backend is a TPU."""
    global _DEFAULT_IMPL
    _DEFAULT_IMPL = impl


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: Optional[jax.Array] = None,
                          impl: str = "auto") -> jax.Array:
    """Multi-head scaled dot-product attention with key-padding mask.

    q: [B,Sq,H,D]; k, v: [B,Sk,H,D]; mask: [B,Sk] (1 = attend) or None.
    impl: 'auto' (pallas on TPU, XLA elsewhere) | 'pallas' | 'xla'.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if impl == "auto":
        impl = _DEFAULT_IMPL or ("pallas" if _on_tpu() else "xla")
    if impl == "pallas":
        return _attention_pallas(q, k, v, mask, scale)
    return _attention_xla(q, k, v, mask, scale)
