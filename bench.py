"""Headline benchmark: flagship 2C fine-tune fwd+bwd throughput on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "memes/sec/chip", "vs_baseline": N}

Model: the reference flagship configuration (AraBERT-base text encoder +
RoBERTa-base caption encoder + ResNet-18 image branch + ConcatAttention3
fusion, batch 16, seq 512, 224² images — ``Multimodal_example_task2C.py``),
running mpmc_tpu's jitted bf16 train step with Pallas attention.

``vs_baseline`` divides by the reference execution model's throughput: the
torch-CPU equivalent measured by ``tools/bench_baseline_torch.py`` (stored in
BASELINE_CPU.json; the reference is single-device torch with no GPU in this
image — SURVEY.md §0, BASELINE.md north star is ≥10× CPU-reference).
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

# Persistent compilation cache: the flagship step compiles once per machine
# (~3 min on the tunneled chip), then reloads in seconds.
try:
    os.makedirs(".cache/jax", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
# rbg PRNG: threefry dropout-mask generation costs ~35 ms/step on this model
# (measured); the hardware RBG generator is the standard production trade.
try:
    jax.config.update("jax_default_prng_impl", "rbg")
except Exception:
    pass

from mpmc_tpu.config import DataConfig, ModelConfig, TrainConfig
from mpmc_tpu.models import MultimodalClassifier
from mpmc_tpu.train.step import (build_train_step_fn, create_train_state,
                                 make_optimizer)

BATCH = 16
WARMUP = 3
STEPS = 20


def _batch(rng, mcfg, n):
    return {
        "text_ids": rng.integers(5, mcfg.text.vocab_size,
                                 (n, mcfg.max_text_len)).astype(np.int32),
        "text_mask": np.ones((n, mcfg.max_text_len), np.int32),
        "image": rng.random((n, mcfg.image.image_size, mcfg.image.image_size,
                             3)).astype(np.float32),
        "caption_ids": rng.integers(5, mcfg.caption.vocab_size,
                                    (n, mcfg.max_caption_len)).astype(np.int32),
        "caption_mask": np.ones((n, mcfg.max_caption_len), np.int32),
        "label": (rng.random(n) > 0.6).astype(np.int32),
    }


def main():
    mcfg = ModelConfig()
    cfg = TrainConfig(model=mcfg, data=DataConfig(batch_size=BATCH))
    model = MultimodalClassifier(mcfg)

    def apply_fn(variables, batch, train, rngs, mutable):
        out = model.apply(variables, batch["text_ids"], batch["text_mask"],
                          batch["image"], batch["caption_ids"],
                          batch["caption_mask"], train=train, rngs=rngs,
                          mutable=mutable)
        return out if isinstance(out, tuple) else (out, {})

    rng = np.random.default_rng(0)
    batch = _batch(rng, mcfg, BATCH)
    variables = model.init(jax.random.key(0), batch["text_ids"],
                           batch["text_mask"], batch["image"],
                           batch["caption_ids"], batch["caption_mask"])
    tx = make_optimizer(cfg, total_steps=1000)
    state, _ = create_train_state(variables, tx)
    # Donation lets XLA update params/opt-state in place — ~30ms/step less
    # HBM traffic at this model size (measured).
    step_fn = jax.jit(build_train_step_fn(apply_fn, cfg, tx),
                      donate_argnums=(0,))

    device_batch = jax.device_put(batch)
    for i in range(WARMUP):
        state, metrics = step_fn(state, device_batch, jax.random.key(i))
        float(metrics["loss"])

    # Host-materialize the loss every step: on the tunneled axon runtime
    # block_until_ready does not reliably block, so a float() pull is the
    # only trustworthy sync point.
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step_fn(state, device_batch,
                                 jax.random.key(WARMUP + i))
        float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS

    memes_per_sec = BATCH / dt

    baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_CPU.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("memes_per_sec")
    vs = memes_per_sec / baseline if baseline else None

    print(json.dumps({
        "metric": "2C fine-tune fwd+bwd throughput (AraBERT+RoBERTa+ResNet18, bs16, seq512)",
        "value": round(memes_per_sec, 2),
        "unit": "memes/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
