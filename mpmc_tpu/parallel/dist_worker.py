"""Multi-process DP worker: one process of an N-process data-parallel step.

Proves the `parallel/distributed.py` path end-to-end on real processes
(SURVEY.md §5.8): each process owns a disjoint host-local slice of the
global batch, `jax.distributed` wires the coordination service, and the
REAL train step (train/step.py build_train_step_fn: loss + valid masking +
grouped-LR Adam) runs over a global mesh spanning every process's devices —
the mean-loss / gradient reduction becomes a cross-process psum (Gloo on
CPU, ICI collectives on a TPU slice).

The reference's only distributed surface is a misconfigured
``local_rank=1`` it never launches (DistilBERT_example_task2A.py:61);
this worker actually runs.  Launch (per process)::

    python -m mpmc_tpu.parallel.dist_worker <pid> <nproc> <port> [steps]

Env: ``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=K``
for the CPU rehearsal (set by the spawner — the sitecustomize in this
environment imports jax at interpreter start, so the env must be set at
process creation, not in-process).  On a real multi-host TPU slice the same
module runs with no env overrides and per-host local devices.

Prints ONE json line: ``{"pid", "nproc", "ndev", "losses", "grad_norms"}``.
With ``nproc=1`` it runs the identical single-process step on the same
GLOBAL batch — the cross-process run must match its losses (the test
asserts it), proving the psum computes the same global gradient.
"""

from __future__ import annotations

import dataclasses
import json
import sys


def run(pid: int, nproc: int, port: int, steps: int = 3) -> dict:
    from mpmc_tpu.parallel.distributed import (host_local_batch_slice,
                                               initialize)
    multi = initialize(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=nproc, process_id=pid)
    if multi != (nproc > 1):
        raise RuntimeError(f"initialize() -> {multi} for nproc={nproc}")

    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mpmc_tpu.cli.experiments import make_apply_fn
    from mpmc_tpu.config import (DataConfig, LossType, ModelConfig,
                                 PoolingType, TrainConfig)
    from mpmc_tpu.models import TextClassifier
    from mpmc_tpu.train.step import (build_train_step_fn, create_train_state,
                                     make_optimizer)

    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    ndev = jax.device_count()

    mcfg = dataclasses.replace(ModelConfig.tiny_2c(), num_classes=2,
                               pooling=PoolingType.CLS)
    B, S = 16, 16
    cfg = TrainConfig(model=mcfg,
                      data=DataConfig(batch_size=B, device_resident=False),
                      epochs=1, learning_rate=1e-3,
                      loss=LossType.CROSS_ENTROPY)

    # The GLOBAL batch, derived identically on every process; each process
    # feeds only its host-local slice (per-host input sharding).
    rng = np.random.default_rng(0)
    ids = rng.integers(5, mcfg.text.vocab_size, (B, S)).astype(np.int32)
    y = rng.integers(0, 2, B).astype(np.int32)
    gbatch_np = {"text_ids": ids, "text_mask": np.ones_like(ids), "label": y}

    model = TextClassifier(mcfg)
    apply_fn = make_apply_fn(model, "text")
    tx = make_optimizer(cfg, total_steps=steps)
    variables = model.init(jax.random.key(0), ids[:2], gbatch_np["text_mask"][:2])
    state, _ = create_train_state(variables, tx)

    mesh = Mesh(np.asarray(jax.devices()).reshape(ndev), ("data",))
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sl = host_local_batch_slice(B)
    batch = {k: jax.make_array_from_process_local_data(data_sh, v[sl], v.shape)
             for k, v in gbatch_np.items()}
    state = jax.device_put(state, repl)

    step_fn = jax.jit(build_train_step_fn(apply_fn, cfg, tx))
    losses, gnorms = [], []
    for i in range(steps):
        state, metrics = step_fn(state, batch, jax.random.key(100 + i))
        losses.append(float(metrics["loss"]))
        gnorms.append(float(metrics["grad_norm"]))
    return {"pid": pid, "nproc": nproc, "ndev": ndev,
            "losses": losses, "grad_norms": gnorms}


def launch_processes(nproc: int, devices_per_proc: int, steps: int = 3,
                     timeout: float = 300.0) -> list:
    """Spawn ``nproc`` localhost worker processes on the CPU backend
    (``devices_per_proc`` virtual XLA devices each) and return their parsed
    result dicts.  Env is set at process creation: this environment's
    sitecustomize imports jax at interpreter start, so in-process overrides
    are too late."""
    import os
    import socket
    import subprocess

    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{devices_per_proc}")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip TPU plugin registration
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "mpmc_tpu.parallel.dist_worker",
         str(i), str(nproc), str(port), str(steps)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(nproc)]
    # Drain every worker's pipes CONCURRENTLY: a sequential communicate()
    # loop deadlocks the whole group if a later worker fills its 64 KB pipe
    # (e.g. verbose XLA warnings) while an earlier one is still blocked in a
    # collective waiting for it.  The finally block kills stragglers on any
    # failure/timeout so no worker leaks holding the coordinator port.
    import threading
    import time as _time

    outs: list = [None] * nproc

    def drain(i: int, p) -> None:
        outs[i] = p.communicate()

    threads = [threading.Thread(target=drain, args=(i, p), daemon=True)
               for i, p in enumerate(procs)]
    try:
        for t in threads:
            t.start()
        deadline = _time.monotonic() + timeout
        for i, t in enumerate(threads):
            t.join(max(deadline - _time.monotonic(), 0.0))
            if t.is_alive():
                raise RuntimeError(
                    f"worker {i} timed out after {timeout:.0f}s")
        results = []
        for i, p in enumerate(procs):
            out, err = outs[i]
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker {i} rc={p.returncode}:\n{err[-2000:]}")
            results.append(json.loads(out.strip().splitlines()[-1]))
        return results
    finally:
        for q in procs:
            if q.poll() is None:
                q.kill()


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    print(json.dumps(run(pid, nproc, port, steps)), flush=True)


if __name__ == "__main__":
    main()
