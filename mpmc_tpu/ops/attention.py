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

def _attention_xla(q, k, v, mask, scale, segments=None):
    # q: [B,Sq,H,D], k/v: [B,Sk,H,D], mask: [B,Sk] or None,
    # segments: [B,S] int (0 = padding) for packed self-attention or None.
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if segments is not None:
        # Packed rows: token i may attend token j iff they belong to the
        # same (non-padding) segment — block-diagonal within the row.
        allow = (segments[:, :, None] == segments[:, None, :]) & (
            segments[:, None, :] > 0)
        scores = scores + (
            1.0 - allow.astype(jnp.float32))[:, None, :, :] * _NEG_INF
    elif mask is not None:
        bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * _NEG_INF
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


def _head_groups(H: int, per_head_bytes: int, shared_bytes: int = 0) -> int:
    """Pick number of groups: smallest divisor count whose group size fits
    the VMEM budget.  ``shared_bytes`` covers group-shared tiles (e.g. the
    [Sq, Sk] f32 segment-bias tile) that don't scale with heads."""
    g = H  # group size
    while g > 1 and (g * per_head_bytes + shared_bytes > _VMEM_BUDGET
                     or H % g):
        g -= 1
    while H % g:
        g -= 1
    return H // g


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------

def _mask_bias(mask_ref, mask_mode):
    """In-kernel additive bias from the mask/segment input.

    'padding': [Sk] bias from a 0/1 key mask.  'segments': [Sq, Sk] bias
    from packed-row segment ids (f32-encoded small ints; 0 = padding) —
    token i attends token j iff same non-zero segment (block-diagonal
    within the packed row; ops/packing.py)."""
    row = mask_ref[0, 0].astype(jnp.float32)                       # [Sk]
    if mask_mode == "padding":
        return ((1.0 - row) * _NEG_INF)[None, :]                   # [1, Sk]
    allow = jnp.logical_and(row[None, :] == row[:, None], row[None, :] > 0)
    return (1.0 - allow.astype(jnp.float32)) * _NEG_INF            # [Sq,Sk]


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                heads, mask_mode):
    # q arrives pre-scaled by 1/sqrt(D) (folded into the host-side transpose,
    # a [B,H,Sq,D] elementwise — 128× fewer elements than scaling the
    # [Sq,Sk] score tile in here).  Softmax runs unnormalized: the division
    # by the denominator is deferred to a [Sq,D] rescale of the output,
    # saving a full [Sq,Sk] VPU pass per head.
    masked = mask_mode != "none"
    if masked:
        bias = _mask_bias(mask_ref, mask_mode)    # [Sk] or [Sq, Sk]
    for h in range(heads):
        q = q_ref[0, h]                          # [Sq, D] input dtype
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / denom).astype(o_ref.dtype)
        lse_ref[0, 0, h] = m[:, 0] + jnp.log(denom[:, 0])


def _fwd_pallas(q, k, v, mask, mask_mode, scale):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    itemsize = q.dtype.itemsize
    lanes = max(D, 128)  # lane padding: D=64 tiles still occupy 128 lanes
    per_head = ((2 * Sq + 2 * Sk) * lanes * itemsize + Sq * Sk * 4)
    # 'segments' builds a group-shared [Sq, Sk] f32 bias tile from the ids.
    shared = Sq * Sk * 4 if mask_mode == "segments" else 0
    groups = _head_groups(H, per_head, shared)
    gh = H // groups                              # heads per group
    ghp = ((gh + 7) // 8) * 8                     # lse sublane padding
    # Fold the 1/sqrt(D) scale into q here: XLA fuses the multiply into the
    # transpose's copy, so it is free relative to an in-kernel [Sq,Sk] pass.
    qt = jnp.transpose(q, (0, 2, 1, 3)) * jnp.asarray(scale, q.dtype)
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if mask is None:
        mask = jnp.ones((B, Sk), dtype=jnp.float32)

    spec_q = pl.BlockSpec((1, gh, Sq, D), lambda b, g: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, gh, Sk, D), lambda b, g: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=gh, mask_mode=mask_mode),
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
                dq_ref, dk_ref, dv_ref, *, scale, heads, mask_mode):
    # q arrives pre-scaled (qs = q/sqrt(D)): s = qs·kᵀ matches the forward,
    # dk = dsᵀ·qs absorbs the scale exactly, and only dq needs a cheap
    # [Sq,D] rescale — this removes the [Sq,Sk] `ds * scale` VPU pass.
    masked = mask_mode != "none"
    if masked:
        bias = _mask_bias(mask_ref, mask_mode)
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
            s = s + bias
        if mask_mode == "segments":
            # Packed rows have fully-masked (seg 0) QUERY rows whose row max
            # is ~-1e9: the stored lse = -1e9 + O(1) loses the O(1) part to
            # f32 absorption and exp(s - lse) rebuilds a wrong softmax for
            # them.  The whole [Sq,Sk] tile is already in VMEM — recompute
            # the row softmax exactly as the forward did instead.
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        else:
            p = jnp.exp(s - lse[:, None])         # [Sq, Sk] f32
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


def _bwd_pallas(mask_mode, scale, residuals, g):
    q, k, v, mask, out, lse = residuals
    do = g
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    itemsize = q.dtype.itemsize
    lanes = max(D, 128)
    per_head = ((4 * Sq + 4 * Sk) * lanes * itemsize + Sq * Sk * 4)
    # 'segments' adds the group-shared [Sq, Sk] f32 bias plus the per-head
    # exact-softmax recompute tiles (e and p) the backward keeps live.
    if mask_mode == "segments":
        per_head += 2 * Sq * Sk * 4
        shared = Sq * Sk * 4
    else:
        shared = 0
    groups = _head_groups(H, per_head, shared)
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
    if mask is None:
        mask_arr = jnp.ones((B, Sk), dtype=jnp.float32)
    else:
        mask_arr = mask.astype(jnp.float32)
    spec_q = pl.BlockSpec((1, gh, Sq, D), lambda b, g: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, gh, Sk, D), lambda b, g: (b, g, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=gh,
                          mask_mode=mask_mode),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_pallas(q, k, v, mask, mask_mode, scale):
    out, _ = _fwd_pallas(q, k, v, mask, mask_mode, scale)
    return out


def _attention_pallas_fwd(q, k, v, mask, mask_mode, scale):
    out, lse = _fwd_pallas(q, k, v, mask, mask_mode, scale)
    return out, (q, k, v, mask, out, lse)


_attention_pallas.defvjp(_attention_pallas_fwd, _bwd_pallas)


# ---------------------------------------------------------------------------
# Sequence/context-parallel impls (inside shard_map over a sequence axis)
# ---------------------------------------------------------------------------

def _attention_ring(q, k, v, mask, scale, axis_name):
    """Ring attention over a sequence-sharded mesh axis.

    Called INSIDE a ``shard_map`` whose mesh binds ``axis_name``: every
    device holds the local token block of q/k/v ``[B, S/P, H, D]`` (and the
    local key-padding mask ``[B, S/P]``).  K/V/mask blocks rotate around the
    ring with one neighbour ``lax.ppermute`` per step while each device
    accumulates its queries' attention blockwise (flash-style running
    max / denominator in f32), so the full ``[S, S]`` score matrix is never
    materialized anywhere and per-chip activation memory scales as 1/P.
    The backward pass is the autodiff transpose (a ppermute transposes to
    the reverse rotation) — no hand-written reverse schedule.

    The reference pads every sequence to 512 on one device
    (``Multimodal_example_task2C.py:276``); this is the TPU-native scaling
    path for drop-in long-context encoders (SURVEY.md §2.3 / §5.7).
    """
    P = jax.lax.axis_size(axis_name)
    B, Sq, H, D = q.shape
    # Scale is folded into q in the INPUT dtype (as in the Pallas kernel) and
    # K/V rotate around the ring in the input dtype too — bf16 halves ring
    # bandwidth vs an up-front f32 upcast; the MXU takes bf16 operands with
    # f32 accumulation, so scores are still f32-exact per block.
    qs = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3)  # [B,H,Sq,D]
    kb = k.transpose(0, 2, 1, 3)
    vb = v.transpose(0, 2, 1, 3)
    if mask is None:
        mb = jnp.ones((B, k.shape[1]), jnp.float32)
    else:
        mb = mask.astype(jnp.float32)
    perm = [(i, (i + 1) % P) for i in range(P)]

    def block(acc, m, l, kb, vb, mb):
        # One K/V block's flash-style accumulation (f32 running max/denom).
        s = jax.lax.dot_general(qs, kb, (((3,), (3,)), ((0, 1), (0, 1))),
                                preferred_element_type=jnp.float32)
        s = s + (1.0 - mb)[:, None, None, :] * _NEG_INF    # [B,H,Sq,Sk]
        new_m = jnp.maximum(m, jnp.max(s, axis=-1))        # [B,H,Sq]
        alpha = jnp.exp(m - new_m)                         # rescale old
        p = jnp.exp(s - new_m[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(p.astype(vb.dtype), vb,
                                 (((3,), (2,)), ((0, 1), (0, 1))),
                                 preferred_element_type=jnp.float32)
        acc = acc * alpha[..., None] + pv
        return acc, new_m, l

    def body(carry, _):
        acc, m, l, kb, vb, mb = carry
        acc, m, l = block(acc, m, l, kb, vb, mb)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        return (acc, m, l, kb, vb, mb), None

    # The rotating K/V/mask blocks are device-varying over the ring axis
    # from the first ppermute on — and the scan-carried accumulators become
    # varying over every manual axis the sharded inputs carry (e.g. a
    # composed (data, seq) mesh).  Mark freshly-created carry entries (the
    # running max/denominator literals, the all-ones mask) varying over the
    # same union so the scan carry types agree (see shard_map scan-vma).
    target_vma = (set(jax.typeof(qs).vma) | set(jax.typeof(kb).vma)
                  | set(jax.typeof(mb).vma) | {axis_name})

    def var(x):
        missing = tuple(target_vma - set(jax.typeof(x).vma))
        if not missing:
            return x
        return jax.lax.pcast(x, missing, to="varying")

    acc = var(jnp.zeros(qs.shape, jnp.float32))
    m = var(jnp.full((B, H, Sq), -jnp.inf, jnp.float32))
    l = var(jnp.zeros((B, H, Sq), jnp.float32))
    kb, vb, mb = var(kb), var(vb), var(mb)
    if P > 1:
        # Rotate on the first P-1 steps only; the final block consumes the
        # last rotation's result without paying a wasted neighbour collective.
        (acc, m, l, kb, vb, mb), _ = jax.lax.scan(
            body, (acc, m, l, kb, vb, mb), None, length=P - 1)
    acc, m, l = block(acc, m, l, kb, vb, mb)
    out = acc / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def _attention_ulysses(q, k, v, mask, scale, axis_name):
    """DeepSpeed-Ulysses-style sequence parallelism: two ``all_to_all``
    re-shards swap the sequence sharding for a *head* sharding, the exact
    attention then runs fully local over ``H/P`` heads (through the stock
    XLA path), and a final all_to_all restores sequence sharding.  Constant
    2 collectives per attention regardless of sequence length — cheaper
    than the ring when ``H % P == 0`` and S·D per-chip fits HBM.

    Same calling convention as :func:`_attention_ring` (inside shard_map,
    local blocks ``[B, S/P, H, D]``; mask ``[B, S/P]``).
    """
    P = jax.lax.axis_size(axis_name)
    H = q.shape[2]
    if H % P:
        raise ValueError(f"ulysses needs heads ({H}) divisible by the "
                         f"sequence-axis size ({P})")
    # [B, S/P, H, D] -> [B, S, H/P, D]: split heads, gather sequence.
    a2a = lambda x: jax.lax.all_to_all(  # noqa: E731
        x, axis_name, split_axis=2, concat_axis=1, tiled=True)
    qg, kg, vg = a2a(q), a2a(k), a2a(v)
    if mask is not None:
        mask = jax.lax.all_gather(mask, axis_name, axis=1, tiled=True)
    out = _attention_xla(qg, kg, vg, mask, scale)      # local: H/P heads
    # [B, S, H/P, D] -> [B, S/P, H, D]
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


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
                          impl: str = "auto",
                          segments: Optional[jax.Array] = None) -> jax.Array:
    """Multi-head scaled dot-product attention with key-padding mask.

    q: [B,Sq,H,D]; k, v: [B,Sk,H,D]; mask: [B,Sk] (1 = attend) or None.
    impl: 'auto' (pallas on TPU, XLA elsewhere) | 'pallas' | 'xla', or a
    sequence-parallel impl usable only inside a shard_map binding the named
    mesh axis: 'ring:<axis>' (ring attention — K/V blocks rotate via
    ppermute) | 'ulysses:<axis>' (all_to_all head re-shard, local exact
    attention).  For the SP impls q/k/v are the LOCAL sequence blocks.

    segments: [B,S] int32 (0 = padding) for PACKED self-attention rows
    (ops/packing.py): token i attends token j iff both carry the same
    non-zero segment id — block-diagonal masking, exactly equivalent to
    running each packed sample as its own row.  Requires Sq == Sk;
    supersedes ``mask``; not supported by the SP impls.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if impl == "auto":
        impl = _DEFAULT_IMPL or ("pallas" if _on_tpu() else "xla")
    if segments is not None:
        if q.shape[1] != k.shape[1]:
            raise ValueError("segment packing requires self-attention "
                             f"(Sq={q.shape[1]} != Sk={k.shape[1]})")
        if impl.startswith(("ring:", "ulysses:")):
            raise ValueError("segment packing is not supported by the "
                             "sequence-parallel impls")
        if impl == "pallas":
            return _attention_pallas(q, k, v, segments.astype(jnp.float32),
                                     "segments", scale)
        return _attention_xla(q, k, v, None, scale, segments=segments)
    if impl.startswith("ring:"):
        return _attention_ring(q, k, v, mask, scale, impl.split(":", 1)[1])
    if impl.startswith("ulysses:"):
        return _attention_ulysses(q, k, v, mask, scale, impl.split(":", 1)[1])
    if impl == "pallas":
        return _attention_pallas(q, k, v, mask,
                                 "none" if mask is None else "padding", scale)
    return _attention_xla(q, k, v, mask, scale)
