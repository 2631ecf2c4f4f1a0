"""Flagship step-time breakdown on the real chip (VERDICT r2 #5).

Decomposes the bs16 bucketed (text 128 / caption 64) flagship 2C train step
into its cost centers by measuring nested subsets of the work:

  fwd            — eval forward only
  fwd+bwd        — value_and_grad, no optimizer
  full step      — fwd+bwd + clip + grouped Adam + param update
  optimizer only — tx.update + apply_updates on captured grads
  augment only   — the on-device uint8 augmentation chain
  text/caption/image branch — per-encoder fwd+bwd with a pooled-logit head

Each measurement runs K steps fused in one lax.scan dispatch and times the
whole dispatch (state threaded through the scan so nothing is dead-code
eliminated), so tunnel dispatch latency (~16 ms/launch) is amortized out.

Writes BREAKDOWN.json at the repo root; bench.py attaches it to the BENCH
extras.  Also prints the HBM roofline arithmetic for the Adam update (the
hypothesis from r2: the step is optimizer-HBM-bound at bs16).
"""

from __future__ import annotations

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
    jax.config.update("jax_default_prng_impl", "rbg")
except Exception:
    pass

from mpmc_tpu.config import (DataConfig, ModelConfig, Subtask, TrainConfig,
                             PoolingType)
from mpmc_tpu.models import MultimodalClassifier
from mpmc_tpu.train.step import (build_train_step_fn, create_train_state,
                                 make_optimizer)

K = int(os.environ.get("MPMC_BD_SCAN", "16"))
REPS = int(os.environ.get("MPMC_BD_REPS", "5"))
TEXT_LEN, CAP_LEN, BS = 128, 64, 16
PEAK_TFLOPS = float(os.environ.get("MPMC_PEAK_TFLOPS", "197"))
HBM_GBPS = float(os.environ.get("MPMC_HBM_GBPS", "819"))


def timed_scan(fn, carry, xs=None):
    """Time ONE jitted lax.scan dispatch of K iterations of ``fn``; returns
    (seconds per iteration, final carry).  fn(carry, x) -> (carry, out)."""
    @jax.jit
    def scanned(c):
        return jax.lax.scan(fn, c, xs, length=K)

    c, out = scanned(carry)           # compile + warm
    jax.block_until_ready(out)
    c, out = scanned(carry)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        c, out = scanned(carry)
        # materialize a scalar from the final state: the only reliable sync
        # on the tunneled runtime
        np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[-1]
        best = min(best, (time.perf_counter() - t0) / K)
    return best, c


def main():
    mcfg = ModelConfig()
    cfg = TrainConfig(model=mcfg, data=DataConfig(batch_size=BS))
    model = MultimodalClassifier(mcfg)

    rng = np.random.default_rng(0)
    batch = {
        "text_ids": rng.integers(5, mcfg.text.vocab_size,
                                 (BS, TEXT_LEN)).astype(np.int32),
        "text_mask": np.ones((BS, TEXT_LEN), np.int32),
        "image": rng.random((BS, 224, 224, 3)).astype(np.float32),
        "caption_ids": rng.integers(5, mcfg.caption.vocab_size,
                                    (BS, CAP_LEN)).astype(np.int32),
        "caption_mask": np.ones((BS, CAP_LEN), np.int32),
        "label": (rng.random(BS) > 0.6).astype(np.int32),
    }

    def apply_fn(variables, b, train, rngs, mutable):
        out = model.apply(variables, b["text_ids"], b["text_mask"],
                          b["image"], b["caption_ids"], b["caption_mask"],
                          train=train, rngs=rngs, mutable=mutable)
        return out if isinstance(out, tuple) else (out, {})

    variables = model.init(jax.random.key(0), batch["text_ids"],
                           batch["text_mask"], batch["image"],
                           batch["caption_ids"], batch["caption_mask"])
    tx = make_optimizer(cfg, total_steps=1000)
    state, _ = create_train_state(variables, tx)
    dev_batch = jax.device_put(batch)
    state = jax.device_put(state)
    results = {}

    # ---- full train step ----
    step_fn = build_train_step_fn(apply_fn, cfg, tx)

    def full_body(st, key):
        st, m = step_fn(st, dev_batch, key)
        return st, m["loss"]

    keys = jax.random.split(jax.random.key(1), K)
    t_full, _ = timed_scan(lambda c, k: full_body(c, k), state, keys)
    results["full_step_ms"] = t_full * 1e3

    # ---- fwd+bwd only (no optimizer) ----
    from mpmc_tpu.ops.losses import sigmoid_focal_loss

    def grad_body(params, key):
        def loss_fn(p):
            cast = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
            out, _ = apply_fn({"params": cast, "batch_stats":
                               state.batch_stats},
                              {k: (v.astype(jnp.bfloat16)
                                   if jnp.issubdtype(v.dtype, jnp.floating)
                                   else v) for k, v in dev_batch.items()},
                              train=True,
                              rngs={"dropout": key, "augment": key},
                              mutable=["batch_stats"])
            return jnp.mean(sigmoid_focal_loss(
                out.astype(jnp.float32),
                dev_batch["label"].astype(jnp.float32)))

        loss, g = jax.value_and_grad(loss_fn)(params)
        # fold the grads back so the scan has a real data dependency
        params = jax.tree_util.tree_map(lambda p, gg: p - 0.0 * gg,
                                        params, g)
        return params, loss

    t_grad, _ = timed_scan(grad_body, state.params, keys)
    results["fwd_bwd_ms"] = t_grad * 1e3

    # ---- forward only ----
    def fwd_body(params, _):
        cast = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        out, _ = apply_fn({"params": cast, "batch_stats": state.batch_stats},
                          dev_batch, train=False, rngs=None, mutable=[])
        params = jax.tree_util.tree_map(
            lambda p: p + 0.0 * jnp.sum(out).astype(p.dtype), params)
        return params, jnp.sum(out)

    t_fwd, _ = timed_scan(fwd_body, state.params, None)
    results["fwd_ms"] = t_fwd * 1e3

    # ---- optimizer only (clip + grouped Adam + apply) ----
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    def opt_body(carry, _):
        params, opt = carry
        updates, opt = tx.update(grads, opt, params)
        params = __import__("optax").apply_updates(params, updates)
        return (params, opt), 0

    t_opt, _ = timed_scan(opt_body, (state.params, state.opt_state), None)
    results["optimizer_only_ms"] = t_opt * 1e3

    # ---- augmentation chain only ----
    from mpmc_tpu.image.augment import train_augment
    u8 = jax.device_put(rng.integers(0, 255, (BS, 224, 224, 3)
                                     ).astype(np.uint8))

    def aug_body(acc, key):
        x = train_augment(key, u8)
        return acc + jnp.sum(x, dtype=jnp.float32), 0

    t_aug, _ = timed_scan(aug_body, jnp.zeros(()), keys)
    results["augment_only_ms"] = t_aug * 1e3

    # ---- per-branch fwd+bwd (encoder + pooled logit head) ----
    from mpmc_tpu.models import TextClassifier, ImageClassifier
    import dataclasses

    def branch_time(make_model, inputs):
        m = make_model()
        vs = m.init(jax.random.key(0), *inputs)
        dev_in = jax.device_put(inputs)

        def body(params, key):
            def loss_fn(p):
                cast = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
                out = m.apply({"params": cast,
                               "batch_stats": vs.get("batch_stats", {})},
                              *dev_in, train=True,
                              rngs={"dropout": key, "augment": key},
                              mutable=["batch_stats"])
                out = out[0] if isinstance(out, tuple) else out
                return jnp.sum(out.astype(jnp.float32) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            params = jax.tree_util.tree_map(lambda p, gg: p - 0.0 * gg,
                                            params, g)
            return params, loss

        t, _ = timed_scan(body, vs["params"], keys)
        return t * 1e3

    tc = dataclasses.replace(ModelConfig(), subtask=Subtask.A, num_classes=2,
                             pooling=PoolingType.CLS)
    results["text_branch_ms"] = branch_time(
        lambda: TextClassifier(tc),
        (batch["text_ids"], batch["text_mask"]))
    cc = dataclasses.replace(tc, text=mcfg.caption)
    results["caption_branch_ms"] = branch_time(
        lambda: TextClassifier(cc),
        (batch["caption_ids"][:, :CAP_LEN], batch["caption_mask"]))
    ic = dataclasses.replace(ModelConfig(), subtask=Subtask.B, num_classes=2)
    results["image_branch_ms"] = branch_time(
        lambda: ImageClassifier(ic), (batch["image"],))

    # ---- lever: bf16 Adam first moment ----
    tx16 = make_optimizer(dataclasses.replace(cfg,
                                              adam_mu_dtype="bfloat16"),
                          total_steps=1000)
    step16 = build_train_step_fn(apply_fn, cfg, tx16)
    st16, _ = create_train_state(variables, tx16)

    def full16_body(st, key):
        st, m = step16(st, dev_batch, key)
        return st, m["loss"]

    t16, _ = timed_scan(full16_body, jax.device_put(st16), keys)
    results["full_step_bf16_mu_ms"] = t16 * 1e3
    del st16, step16  # free HBM before the next lever's state (~3 GB each)

    # ---- lever: factored-RMS embedding tables (+ bf16 mu) ----
    # --embedding-optimizer factored: the [V,H] word-embedding tables move
    # to momentum-free factored-second-moment RMS ([V]+[H] state), removing
    # their mu/nu read-modify-write from the optimizer pass entirely.
    txf = make_optimizer(
        dataclasses.replace(cfg, adam_mu_dtype="bfloat16",
                            embedding_optimizer="factored"),
        total_steps=1000)
    stepf = build_train_step_fn(apply_fn, cfg, txf)
    stf, _ = create_train_state(variables, txf)

    def fullf_body(st, key):
        st, m = stepf(st, dev_batch, key)
        return st, m["loss"]

    tf_, _ = timed_scan(fullf_body, jax.device_put(stf), keys)
    results["full_step_factored_embed_bf16_mu_ms"] = tf_ * 1e3
    del stf, stepf  # free HBM before the sparse lever's state

    # ---- lever: sparse (lazy) row-Adam embedding tables (+ bf16 mu) ----
    # --embedding-optimizer sparse: exact Adam on only the vocab rows the
    # step's gradient touches (≤ bs × seq-len per table), frozen elsewhere
    # (train/sparse_opt.py) — the full-table optimizer read-modify-write
    # disappears.  Support sized exactly as the driver does (realized
    # batch shapes).
    txs = make_optimizer(
        dataclasses.replace(cfg, adam_mu_dtype="bfloat16",
                            embedding_optimizer="sparse"),
        total_steps=1000, embed_support=BS * TEXT_LEN)
    steps_ = build_train_step_fn(apply_fn, cfg, txs)
    sts, _ = create_train_state(variables, txs)

    def fulls_body(st, key):
        st, m = steps_(st, dev_batch, key)
        return st, m["loss"]

    ts_, _ = timed_scan(fulls_body, jax.device_put(sts), keys)
    results["full_step_sparse_embed_bf16_mu_ms"] = ts_ * 1e3
    n_embed = sum(
        int(np.prod(np.shape(leaf)))
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            state.params)[0]
        if "word_embeddings" in
        "/".join(str(getattr(k, "key", k)) for k in path))
    results["word_embedding_params"] = n_embed

    # ---- roofline arithmetic ----
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree_util.tree_leaves(state.params))
    # Adam f32: read p, g, mu, nu; write p, mu, nu  -> 7 x 4B per param
    adam_gb = n_params * 7 * 4 / 1e9
    results["n_params"] = n_params
    results["adam_hbm_gb_per_step"] = adam_gb
    results["adam_hbm_floor_ms"] = adam_gb / HBM_GBPS * 1e3
    # matmul flop model (same as bench.py)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from importlib import import_module
    bench = import_module("bench")
    tflop = bench._step_tflop(mcfg, TEXT_LEN, CAP_LEN, BS)
    results["matmul_tflop_per_step"] = tflop
    results["matmul_floor_ms"] = tflop / PEAK_TFLOPS * 1e3
    results["mfu_full_step"] = tflop / (t_full * PEAK_TFLOPS)
    results["mfu_fwd_bwd"] = tflop / (t_grad * PEAK_TFLOPS)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BREAKDOWN.json")
    with open(out_path, "w") as f:
        json.dump({k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in results.items()}, f, indent=1)
    print(json.dumps(results, indent=1))
    print(f"written to {out_path}")


if __name__ == "__main__":
    main()
