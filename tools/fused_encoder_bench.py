"""GO/NO-GO microbench for fusing the text+caption encoder dispatches.

VERDICT r4 weak #2: the flagship's two 12-layer 768-wide BERT stacks (text
S=128, caption S=64 bucketed) dispatch separately — two chains of small
matmuls (reference runs them as two sequential HF calls,
Multimodal_example_task2C.py:667-673).  This measures, on the real chip,
fwd+bwd over 12 layers for three execution plans with IDENTICAL weights:

  separate     — today's plan: text [16,128,H] then caption [16,64,H],
                 each through its own layer stack.
  token-fused  — caption rows packed 2-per-row to [8,128] (segment-masked
                 attention, exact numerics); both branches' tokens flattened
                 and blocked [3,1024,H] (blocks 0-1 text, 2 caption); every
                 dense op one batched einsum with branch-gathered weights;
                 ONE segment attention call over the concatenated [24,128]
                 rows.  Matmul FLOPs identical to `separate` (+~20% on the
                 3%-share attention; +1.5x weight reads, ~0.1 ms HBM).
  vmap-padded  — caption padded to [16,128]; both branches stacked [2,...]
                 and the layer vmapped over branch-stacked params.  Simple,
                 but 2x caption dense FLOPs / 4x caption attention.

Numerics: token-fused asserts allclose vs separate before timing (same
math per token; caption packing is the parity-tested ops/packing.py
transform).  Prints one JSON line with ms/step for each plan.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    cache = os.path.join(os.path.expanduser("~"), ".cache", "mpmc_tpu", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from mpmc_tpu.ops.attention import dot_product_attention

B = int(os.environ.get("MPMC_FEB_B", "16"))  # must be even (caption 2-pack)
ST, SC, H, NH, F, L = 128, 64, 768, 12, 3072, 12
HD = H // NH
EPS = (1e-12, 1e-5)  # AraBERT vs RoBERTa layer_norm_eps
K = int(os.environ.get("MPMC_FEB_SCAN", "8"))
REPS = int(os.environ.get("MPMC_FEB_REPS", "5"))
C = B * SC  # token block size: caption tokens fill 1 block, text fills 2


def init_params(key, branches=2):
    ks = jax.random.split(key, 16)
    s = 0.02

    def mk(i, *shape):
        return s * jax.random.normal(ks[i], (branches, L) + shape,
                                     jnp.float32)

    return {
        "wq": mk(0, H, H), "bq": mk(1, H), "wk": mk(2, H, H), "bk": mk(3, H),
        "wv": mk(4, H, H), "bv": mk(5, H), "wo": mk(6, H, H), "bo": mk(7, H),
        "g1": 1.0 + mk(8, H), "c1": mk(9, H),
        "w1": mk(10, H, F), "b1": mk(11, F),
        "w2": mk(12, F, H), "b2": mk(13, H),
        "g2": 1.0 + mk(14, H), "c2": mk(15, H),
    }


def ln(x, g, b, eps):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * g + b


def layer_plain(x, mask, p, eps):
    """One post-LN BERT layer on [R,S,H] with per-branch weights p[l]."""
    bf = jnp.bfloat16
    xb = x.astype(bf)
    q = (xb @ p["wq"].astype(bf) + p["bq"].astype(bf))
    k = (xb @ p["wk"].astype(bf) + p["bk"].astype(bf))
    v = (xb @ p["wv"].astype(bf) + p["bv"].astype(bf))
    R, S = x.shape[:2]
    ctx = dot_product_attention(q.reshape(R, S, NH, HD),
                                k.reshape(R, S, NH, HD),
                                v.reshape(R, S, NH, HD), mask)
    out = ctx.reshape(R, S, H) @ p["wo"].astype(bf) + p["bo"].astype(bf)
    x = ln((x + out.astype(jnp.float32)), p["g1"], p["c1"], eps)
    h = jax.nn.gelu(x.astype(bf) @ p["w1"].astype(bf) + p["b1"].astype(bf),
                    approximate=False)
    h = h @ p["w2"].astype(bf) + p["b2"].astype(bf)
    return ln(x + h.astype(jnp.float32), p["g2"], p["c2"], eps)


def fwd_separate(params, xt, xc, mask_t, mask_c):
    at, ac = xt, xc
    for l in range(L):
        pt = {k: v[0, l] for k, v in params.items()}
        pc = {k: v[1, l] for k, v in params.items()}
        at = layer_plain(at, mask_t, pt, EPS[0])
        ac = layer_plain(ac, mask_c, pc, EPS[1])
    return jnp.sum(at * at) + jnp.sum(ac * ac)


E = (0, 0, 1)  # block -> branch map: 2 text blocks of 1024, 1 caption block


def layer_fused(x, segments, p, eps_vec):
    """One layer over branch-blocked tokens x [G,C,H].

    Dense ops: batched einsum with branch-gathered weights (e static).
    Attention: ONE segment-masked call over the row view [R,S,...]."""
    bf = jnp.bfloat16
    g = np.asarray(E)

    def dense(xb, w, b):
        return (jnp.einsum("gch,ghk->gck", xb, w[g].astype(bf))
                + b[g].astype(bf)[:, None, :])

    xb = x.astype(bf)
    q = dense(xb, p["wq"], p["bq"])
    k = dense(xb, p["wk"], p["bk"])
    v = dense(xb, p["wv"], p["bv"])
    G = len(E)
    R = G * C // 128
    rows = lambda t: t.reshape(R, 128, NH, HD)  # noqa: E731
    ctx = dot_product_attention(rows(q), rows(k), rows(v), None,
                                segments=segments)
    out = dense(ctx.reshape(G, C, H), p["wo"], p["bo"])
    gather = lambda t: t[g][:, None, :]  # noqa: E731
    x = ln(x + out.astype(jnp.float32), gather(p["g1"]), gather(p["c1"]),
           eps_vec)
    h = jax.nn.gelu(dense(x.astype(bf), p["w1"], p["b1"]), approximate=False)
    h = dense(h, p["w2"], p["b2"])
    return ln(x + h.astype(jnp.float32), gather(p["g2"]), gather(p["c2"]),
              eps_vec)


def fwd_fused(params, xt, xc_packed, segments):
    # flatten tokens: text rows [16,128,H] -> 2048, caption packed [8,128,H]
    x = jnp.concatenate([xt.reshape(-1, H), xc_packed.reshape(-1, H)], 0)
    x = x.reshape(len(E), C, H)
    eps_vec = jnp.array([EPS[e] for e in E], jnp.float32)[:, None, None]
    for l in range(L):
        p = {k: v[:, l] for k, v in params.items()}
        x = layer_fused(x, segments, p, eps_vec)
    return jnp.sum(x * x)


def fwd_vmap(params, x2, mask2):
    """Branch-stacked plan: x2 [2,16,128,H], caption zero-padded."""
    def one(br_params, x, mask, eps):
        for l in range(L):
            p = {k: v[l] for k, v in br_params.items()}
            x = layer_plain(x, mask, p, eps)
        return x
    eps_vec = jnp.array(EPS, jnp.float32)
    out = jax.vmap(one, in_axes=(0, 0, 0, 0))(params, x2, mask2, eps_vec)
    return jnp.sum(out * out)


def timed(fn, *args):
    @jax.jit
    def k_steps(args):
        def body(c, _):
            val, grads = jax.value_and_grad(fn)(*c)
            # thread the param grads back so nothing is DCE'd
            p = jax.tree_util.tree_map(lambda a, g: a + 0.0 * g, c[0], grads)
            return (p,) + c[1:], val
        return jax.lax.scan(body, args, None, length=K)

    args = jax.device_put(args)
    out = k_steps(args)
    jax.tree_util.tree_leaves(out[1])[0].block_until_ready()
    float(np.asarray(out[1])[-1])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = k_steps(args)
        float(np.asarray(out[1])[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def main():
    key = jax.random.key(0)
    params = init_params(key)
    kx = jax.random.split(jax.random.key(1), 3)
    xt = 0.5 * jax.random.normal(kx[0], (B, ST, H), jnp.float32)
    xc = 0.5 * jax.random.normal(kx[1], (B, SC, H), jnp.float32)
    mask_t = jnp.ones((B, ST), jnp.float32)
    mask_c = jnp.ones((B, SC), jnp.float32)

    # caption packed 2-per-row: rows [8,128], segments 1/2 per half
    xc_packed = xc.reshape(B // 2, 2 * SC, H)
    seg_c = jnp.concatenate([jnp.full((B // 2, SC), 1, jnp.int32),
                             jnp.full((B // 2, SC), 2, jnp.int32)], 1)
    seg_t = jnp.ones((B, ST), jnp.int32)
    segments = jnp.concatenate([seg_t, seg_c], 0)

    # numerics: fused == separate (per-branch final activations)
    def final_sep(params, xt, xc):
        at, ac = xt, xc
        for l in range(L):
            pt = {k: v[0, l] for k, v in params.items()}
            pc = {k: v[1, l] for k, v in params.items()}
            at = layer_plain(at, mask_t, pt, EPS[0])
            ac = layer_plain(ac, mask_c, pc, EPS[1])
        return at, ac

    def final_fused(params, xt, xc_packed):
        x = jnp.concatenate([xt.reshape(-1, H), xc_packed.reshape(-1, H)], 0)
        x = x.reshape(len(E), C, H)
        eps_vec = jnp.array([EPS[e] for e in E], jnp.float32)[:, None, None]
        for l in range(L):
            p = {k: v[:, l] for k, v in params.items()}
            x = layer_fused(x, segments, p, eps_vec)
        flat = x.reshape(-1, H)
        return (flat[:B * ST].reshape(B, ST, H),
                flat[B * ST:].reshape(B // 2, 2 * SC, H).reshape(B, SC, H))

    at, ac = jax.jit(final_sep)(params, xt, xc)
    ft, fc = jax.jit(final_fused)(params, xt, xc_packed)
    err_t = float(jnp.max(jnp.abs(at - ft)))
    err_c = float(jnp.max(jnp.abs(ac - fc)))
    scale = float(jnp.max(jnp.abs(at)))
    assert err_t < 2e-2 * scale and err_c < 2e-2 * scale, (err_t, err_c)

    sep_ms = timed(fwd_separate, params, xt, xc, mask_t, mask_c)
    fused_ms = timed(fwd_fused, params, xt, xc_packed, segments)
    x2 = jnp.stack([xt, jnp.pad(xc, ((0, 0), (0, ST - SC), (0, 0)))])
    mask2 = jnp.stack([mask_t, jnp.pad(mask_c, ((0, 0), (0, ST - SC)))])
    vmap_ms = timed(fwd_vmap, params, x2, mask2)

    print(json.dumps({
        "separate_ms": round(sep_ms, 3),
        "token_fused_ms": round(fused_ms, 3),
        "vmap_padded_ms": round(vmap_ms, 3),
        "fused_speedup": round(sep_ms / fused_ms, 3),
        "allclose_max_err": [round(err_t, 5), round(err_c, 5)],
        "note": f"fwd+bwd over {L} layers, bs{B}, text {ST} / caption {SC}"
                f" bucketed, bf16 matmuls, K={K} scan, best of {REPS}",
    }))


if __name__ == "__main__":
    main()
