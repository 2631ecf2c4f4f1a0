"""Attention core: Pallas TPU kernel with an XLA fallback.

Replaces the torch/cuDNN attention inside the reference's HF encoders (all of
L4, SURVEY.md §2.2).  Sequence lengths here are fixed and ≤512 with head dim
64, so entire per-sample attention state fits in VMEM.  Two profile findings
on this workload (bs16, S512, H12) shaped the kernel:

* a grid instance per (batch, head) pays far more in dispatch/DMA overhead
  than in math — so each instance processes a *group* of heads (grid
  (B, groups)), with the group size chosen against the VMEM budget;
* heads must be indexed on a **major** axis ([B,H,S,D] blocks, the per-head
  [S,D] tile selected by sublane-major index) — slicing 64-lane head columns
  out of a packed [S, H·D] tile forces catastrophic Mosaic lane relayouts
  (measured 90× slower).

Scores hit the MXU in the input dtype (bf16 under the train policy) with f32
accumulation; the numerically-stable masked softmax runs on the VPU in f32;
nothing S×S ever touches HBM.  The backward pass is a second Pallas kernel
over saved (out, lse) residuals — standard flash-attention backward algebra —
wired via jax.custom_vjp.

Layout: q/k/v are [B, Sq|Sk, H, D] at the API (flax convention); key-padding
mask is [B, Sk] with 1 = attend.  Cross-attention (Sq ≠ Sk) is supported.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9  # matches the reference's additive mask (-1e9), not -inf

# Per-instance VMEM budget for picking the head-group size (bytes); actual
# VMEM is ~2× this due to pipeline double buffering.
_VMEM_BUDGET = 5 * 1024 * 1024


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


def _head_groups(H: int, per_head_bytes: int) -> int:
    """Pick number of groups: smallest divisor count whose group size fits
    the VMEM budget."""
    g = H  # group size
    while g > 1 and (g * per_head_bytes > _VMEM_BUDGET or H % g):
        g -= 1
    while H % g:
        g -= 1
    return H // g


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                heads, masked):
    # q arrives pre-scaled by 1/sqrt(D) (folded into the host-side transpose,
    # a [B,H,Sq,D] elementwise — 128× fewer elements than scaling the
    # [Sq,Sk] score tile in here).  Softmax runs unnormalized: the division
    # by the denominator is deferred to a [Sq,D] rescale of the output,
    # saving a full [Sq,Sk] VPU pass per head.
    if masked:
        bias = (1.0 - mask_ref[0, 0].astype(jnp.float32)) * _NEG_INF  # [Sk]
    for h in range(heads):
        q = q_ref[0, h]                          # [Sq, D] input dtype
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            s = s + bias[None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / denom).astype(o_ref.dtype)
        lse_ref[0, 0, h] = m[:, 0] + jnp.log(denom[:, 0])


def _fwd_pallas(q, k, v, mask, scale):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    itemsize = q.dtype.itemsize
    lanes = max(D, 128)  # lane padding: D=64 tiles still occupy 128 lanes
    per_head = ((2 * Sq + 2 * Sk) * lanes * itemsize + Sq * Sk * 4)
    groups = _head_groups(H, per_head)
    gh = H // groups                              # heads per group
    ghp = ((gh + 7) // 8) * 8                     # lse sublane padding
    # Fold the 1/sqrt(D) scale into q here: XLA fuses the multiply into the
    # transpose's copy, so it is free relative to an in-kernel [Sq,Sk] pass.
    qt = jnp.transpose(q, (0, 2, 1, 3)) * jnp.asarray(scale, q.dtype)
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    masked = mask is not None
    if mask is None:
        mask = jnp.ones((B, Sk), dtype=jnp.float32)

    spec_q = pl.BlockSpec((1, gh, Sq, D), lambda b, g: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, gh, Sk, D), lambda b, g: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=gh, masked=masked),
        grid=(B, groups),
        in_specs=[
            spec_q, spec_k, spec_k,
            pl.BlockSpec((1, 1, Sk), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            spec_q,
            # lse head axis padded to a sublane multiple (tiling rule: the
            # second-to-last block dim must divide 8 or span the array dim)
            pl.BlockSpec((1, 1, ghp, Sq), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, groups, ghp, Sq), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Sq * Sk * D,
            bytes_accessed=B * H * (2 * Sq + 2 * Sk) * D * itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qt, kt, vt, mask.astype(jnp.float32)[:, None, :])
    lse = lse[:, :, :gh, :].reshape(B, H, Sq)     # strip head padding
    return jnp.transpose(out, (0, 2, 1, 3)), lse


# ---------------------------------------------------------------------------
# Pallas backward
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, heads, masked):
    # q arrives pre-scaled (qs = q/sqrt(D)): s = qs·kᵀ matches the forward,
    # dk = dsᵀ·qs absorbs the scale exactly, and only dq needs a cheap
    # [Sq,D] rescale — this removes the [Sq,Sk] `ds * scale` VPU pass.
    if masked:
        bias = (1.0 - mask_ref[0, 0].astype(jnp.float32)) * _NEG_INF
    for h in range(heads):
        qs = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        o = o_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h]
        do_f32 = do.astype(jnp.float32)
        lse = lse_ref[0, 0, h]                    # [Sq]
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            s = s + bias[None, :]
        p = jnp.exp(s - lse[:, None])             # [Sq, Sk] f32
        p_lo = p.astype(v.dtype)
        dv_ref[0, h] = jax.lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do_f32 * o, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(qs.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dq_ref[0, h] = (dq * scale).astype(dq_ref.dtype)
        dk_ref[0, h] = jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bwd_pallas(scale, residuals, g):
    q, k, v, mask, out, lse = residuals
    do = g
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    itemsize = q.dtype.itemsize
    lanes = max(D, 128)
    per_head = ((4 * Sq + 4 * Sk) * lanes * itemsize + Sq * Sk * 4)
    groups = _head_groups(H, per_head)
    gh = H // groups
    ghp = ((gh + 7) // 8) * 8
    lse = lse.reshape(B, groups, gh, Sq)
    if ghp != gh:
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, ghp - gh), (0, 0)))
    qt = jnp.transpose(q, (0, 2, 1, 3)) * jnp.asarray(scale, q.dtype)
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    ot = jnp.transpose(out, (0, 2, 1, 3))
    dot_ = jnp.transpose(do, (0, 2, 1, 3))
    masked = mask is not None
    if mask is None:
        mask_arr = jnp.ones((B, Sk), dtype=jnp.float32)
    else:
        mask_arr = mask.astype(jnp.float32)
    spec_q = pl.BlockSpec((1, gh, Sq, D), lambda b, g: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, gh, Sk, D), lambda b, g: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=gh, masked=masked),
        grid=(B, groups),
        in_specs=[
            spec_q, spec_k, spec_k,
            pl.BlockSpec((1, 1, Sk), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_q,
            pl.BlockSpec((1, 1, ghp, Sq), lambda b, g: (b, g, 0, 0),
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
    )(qt, kt, vt, mask_arr[:, None, :], ot, lse, dot_)
    return (jnp.transpose(dq, (0, 2, 1, 3)),
            jnp.transpose(dk, (0, 2, 1, 3)),
            jnp.transpose(dv, (0, 2, 1, 3)), None)


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
