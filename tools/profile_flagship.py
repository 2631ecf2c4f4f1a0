"""Profile the flagship 2C train step (scan-fused) and print a device-time
breakdown grouped by op category.

Usage: python tools/profile_flagship.py [--scan K] [--bs B] [--text S]
       [--cap S]

Parses the jax.profiler trace for complete ('X') events on every device
lane (the run-queue-named lanes carry the executable; op events live in
child lanes) and buckets op names into categories: attention kernels,
other matmul fusions, convert/reduce fusions, adam/optimizer, embeddings,
copies/transposes, everything else.  Output is ms per optimizer step.
"""
import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

from mpmc_tpu.config import DataConfig, ModelConfig, TrainConfig
from mpmc_tpu.models import MultimodalClassifier
from mpmc_tpu.train.step import (build_train_step_fn, create_train_state,
                                 make_optimizer, make_scan_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--text", type=int, default=128)
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    mcfg = ModelConfig()
    cfg = TrainConfig(model=mcfg, data=DataConfig(batch_size=args.bs),
                      scan_steps=max(args.scan, 1))
    model = MultimodalClassifier(mcfg)

    def apply_fn(variables, batch, train, rngs, mutable):
        out = model.apply(variables, batch["text_ids"], batch["text_mask"],
                          batch["image"], batch["caption_ids"],
                          batch["caption_mask"], train=train, rngs=rngs,
                          mutable=mutable)
        return out if isinstance(out, tuple) else (out, {})

    rng = np.random.default_rng(0)
    B, TL, CL = args.bs, args.text, args.cap
    batch = {
        "text_ids": rng.integers(
            5, mcfg.text.vocab_size, (B, TL)).astype(np.int32),
        "text_mask": np.ones((B, TL), np.int32),
        "image": rng.random((B, 224, 224, 3)).astype(np.float32),
        "caption_ids": rng.integers(
            5, mcfg.caption.vocab_size, (B, CL)).astype(np.int32),
        "caption_mask": np.ones((B, CL), np.int32),
        "label": (rng.random(B) > 0.6).astype(np.int32),
    }
    variables = model.init(jax.random.key(0), batch["text_ids"],
                           batch["text_mask"], batch["image"],
                           batch["caption_ids"], batch["caption_mask"])
    tx = make_optimizer(cfg, total_steps=1000)
    state, _ = create_train_state(variables, tx)
    k = args.scan
    if k > 1:
        step_fn = make_scan_train_step(apply_fn, cfg, tx)
        batch = {key: np.broadcast_to(v, (k,) + v.shape).copy()
                 for key, v in batch.items()}
    else:
        step_fn = jax.jit(build_train_step_fn(apply_fn, cfg, tx),
                          donate_argnums=(0,))
    db = jax.device_put(batch)
    for i in range(2):
        state, m = step_fn(state, db, jax.random.key(i))
        float(np.ravel(m["loss"])[-1])

    logdir = "/tmp/trace_flagship"
    jax.profiler.start_trace(logdir)
    for i in range(args.iters):
        state, m = step_fn(state, db, jax.random.key(10 + i))
    float(np.ravel(m["loss"])[-1])
    jax.profiler.stop_trace()

    n_steps = args.iters * k
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    latest = max(paths, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        data = json.load(f)
    pid_names = {e.get("pid"): e["args"].get("name", "")
                 for e in data.get("traceEvents", [])
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "tpu" in n or "Device" in n}
    by_name = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        by_name.setdefault(name, [0, 0.0])
        by_name[name][0] += 1
        by_name[name][1] += e.get("dur", 0) / 1e3

    def cat(name):
        n = name.lower()
        if "attention" in n or "flash" in n:
            return "attention-kernel"
        if "convert" in n and "fusion" in n:
            return "convert/reduce"
        if n.startswith(("copy", "transpose")) or "copy" in n:
            return "copies"
        if "dynamic-update-slice" in n or "dynamic-slice" in n:
            return "scan-slices"
        if "fusion" in n or "dot" in n or "conv" in n:
            return "matmul/conv-fusions"
        if "rng" in n or "bitcast" in n:
            return "rng/bitcast"
        return "other"

    cats = {}
    for name, (cnt, ms) in by_name.items():
        c = cat(name)
        cats.setdefault(c, [0, 0.0])
        cats[c][0] += cnt
        cats[c][1] += ms
    tot = sum(v[1] for v in cats.values())
    print(f"\n== total device op-ms/step: {tot/n_steps:.2f} "
          f"(over {n_steps} steps) ==")
    for c, (cnt, ms) in sorted(cats.items(), key=lambda kv: -kv[1][1]):
        print(f"{ms/n_steps:8.3f} ms/step  x{cnt:5d}  {c}")
    print("\n-- top 25 individual ops --")
    for name, (cnt, ms) in sorted(by_name.items(),
                                  key=lambda kv: -kv[1][1])[:25]:
        print(f"{ms/n_steps:8.3f} ms/step  x{cnt:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
