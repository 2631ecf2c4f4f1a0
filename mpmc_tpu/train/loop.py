"""Training loop with in-epoch evaluation and best-F1 TSV emission.

Reproduces the reference loop's *semantics* (``Multimodal_example_task2C.py:
689-776``) on a fundamentally different execution model: batches are slices of
pre-tokenized host arrays (no per-sample re-tokenization each epoch), every
batch is padded to the static batch size so the step compiles exactly once,
eval runs ``eval_per_epoch`` times per epoch plus at epoch end, the optimal
ROC/Youden threshold is recomputed per eval (C18), and when test macro-F1
improves, label + probability TSVs are written (C17/C19 behavior — but with
deterministic, id-sorted row order instead of the reference's shuffled eval
loader order; the scorer sorts by id, so scores are unaffected).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from mpmc_tpu.config import TrainConfig
from mpmc_tpu.io.scorer import accuracy_score, macro_f1
from mpmc_tpu.io.tsv import write_label_tsv, write_prob_tsv
from mpmc_tpu.train.metrics import optimal_threshold_youden

log = logging.getLogger(__name__)


def pad_to(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[0] == size:
        return arr
    pad = [(0, size - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def batch_iter(data: Dict[str, np.ndarray], batch_size: int,
               shuffle: bool = False,
               rng: Optional[np.random.Generator] = None,
               with_valid: bool = False,
               ) -> Iterator[Tuple[Dict[str, np.ndarray], int]]:
    """Yield (batch, n_valid) with every batch padded to ``batch_size``
    (static shapes → one compilation).

    The short final batch is padded by *replicating* real samples
    (wrap-around over the epoch's index order) rather than zero rows, so
    BatchNorm batch_stats never see fake all-zero inputs.  With
    ``with_valid`` the batch additionally carries a float32 ``valid`` [B]
    mask so the train step can exclude the replicated rows from the loss
    (the reference simply runs a smaller final batch,
    ``Multimodal_example_task2C.py:154-162``)."""
    n = len(next(iter(data.values())))
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    for start in range(0, n, batch_size):
        take = idx[start:start + batch_size]
        full = (np.concatenate([take, np.resize(idx, batch_size - len(take))])
                if len(take) < batch_size else take)
        batch = {k: v[full] for k, v in data.items()}
        if with_valid:
            batch["valid"] = (np.arange(batch_size)
                              < len(take)).astype(np.float32)
        yield batch, len(take)


def prefetch_batches(it: Iterator[Tuple[Dict[str, np.ndarray], int]],
                     put: Callable = lambda b: b, depth: int = 2,
                     stats: Optional[Dict[str, float]] = None,
                     ) -> Iterator[Tuple[object, Dict[str, np.ndarray], int]]:
    """Device-side double buffering: run ``put`` (typically a sharded
    ``jax.device_put``) on a background thread ``depth`` batches ahead, so
    host→device copies overlap the previous step's compute.  The reference
    pays this copy synchronously per step (``Multimodal_example_task2C.py:
    703-708``).  Yields ``(device_batch, host_batch, n_valid)`` — the host
    batch is kept for failure-dump postmortems.

    ``stats`` (optional dict, updated in place) quantifies the BASELINE.md
    "zero input-pipeline stalls" target instead of asserting it: ``gets``
    (batches consumed), ``empty_gets`` (the queue was empty when the
    consumer asked — the producer fell behind the dispatch rate),
    ``wait_s`` (total consumer time blocked in the queue), and ``put_s``
    (producer time inside ``put`` — the H2D copy share)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    STOP = object()
    errs: List[BaseException] = []

    def producer():
        try:
            for batch, n_valid in it:
                if stats is not None:
                    p0 = time.perf_counter()
                    dev = put(batch)
                    stats["put_s"] = (stats.get("put_s", 0.0)
                                      + time.perf_counter() - p0)
                    q.put((dev, batch, n_valid))
                else:
                    q.put((put(batch), batch, n_valid))
        except BaseException as e:  # surface on the consumer thread
            errs.append(e)
        q.put(STOP)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        if stats is not None:
            empty = q.empty()
            t0 = time.perf_counter()
            item = q.get()
            stats["wait_s"] = (stats.get("wait_s", 0.0)
                               + time.perf_counter() - t0)
            if item is not STOP:
                stats["gets"] = stats.get("gets", 0) + 1
                stats["empty_gets"] = stats.get("empty_gets", 0) + int(empty)
        else:
            item = q.get()
        if item is STOP:
            break
        yield item
    if errs:
        raise errs[0]


def _scan_group_plan(steps_per_epoch: int, check_interval: int, k: int,
                     eval_on: bool) -> List[int]:
    """Group sizes for one epoch of scan-fused dispatch: full-K groups plus
    remainders, with groups never straddling an eval boundary so the eval
    cadence (``bi % check_interval == 0`` or epoch end) is bit-identical to
    per-step dispatch.  Remainder groups (size < K) are executed by the
    single-step path — at most two compiled executables total."""
    if eval_on:
        ends = [i for i in range(1, steps_per_epoch + 1)
                if i % check_interval == 0 or i == steps_per_epoch]
    else:
        ends = [steps_per_epoch]
    plan, prev = [], 0
    for e in ends:
        seg = e - prev
        plan += [k] * (seg // k)
        if seg % k:
            plan.append(seg % k)
        prev = e
    return plan


def _scan_groups(it: Iterator[Tuple[Dict[str, np.ndarray], int]],
                 plan: List[int], k: int,
                 ) -> Iterator[Tuple[Dict[str, np.ndarray], object]]:
    """Chunk the per-step batch iterator according to ``plan``: full-K
    groups are stacked on a leading axis (yielded with the list of per-step
    n_valid), smaller groups fall through as single steps."""
    for size in plan:
        try:
            items = [next(it) for _ in range(size)]
        except StopIteration as e:  # pragma: no cover - plan/iter invariant
            raise RuntimeError(
                "scan group plan is longer than the batch iterator — "
                "plan must be built from the same steps_per_epoch") from e
        if size == k:
            stacked = {key: np.stack([b[key] for b, _ in items])
                       for key in items[0][0]}
            yield stacked, [n for _, n in items]
        else:
            for b, n in items:
                yield b, n


@dataclasses.dataclass
class DeviceData:
    """A logical data split over a device-resident dataset: ``data`` is the
    full pytree uploaded to HBM once (driver-side), ``abs_idx`` the rows of
    it this split uses.  Batches are assembled on device by row-gather
    (train.step._gather_rows) — the host ships only int32 indices per step,
    which matters when the host↔device link is slow (a tunneled chip here
    measures ~25-50 MB/s; streaming bs16 uint8 pixels would cost more than
    the whole device step)."""
    data: object
    abs_idx: np.ndarray


@dataclasses.dataclass
class EvalResult:
    loss: float
    accuracy: float
    macro_f1: float
    threshold: float
    probs: np.ndarray  # [N] propaganda probability, dataset order


def run_eval(state, eval_step, data: Dict[str, np.ndarray],
             batch_size: int, put: Callable = lambda b: b,
             scan_eval_step=None, scan_k: int = 1,
             put_stacked: Optional[Callable] = None,
             gather_eval=None, gather_scan_eval=None,
             dev: Optional[DeviceData] = None) -> EvalResult:
    """Full pass → sigmoid probs → ROC/Youden threshold → acc + macro-F1
    (reference ``test()``, :779-834).

    With ``scan_eval_step`` (train.step.make_scan_eval_step) groups of
    ``scan_k`` eval batches run as one device dispatch — a full pass is
    otherwise ceil(N/B) launches, each costing a host round-trip.  With
    ``gather_eval``/``dev`` the split is device-resident and only row
    indices cross the host link (train.step.make_gather_eval_step)."""
    n = len(next(iter(data.values())))
    n_batches = (n + batch_size - 1) // batch_size
    use_gather = gather_eval is not None and dev is not None
    if use_gather:
        it = batch_iter({"idx": dev.abs_idx.astype(np.int32)}, batch_size)
    else:
        it = batch_iter(data, batch_size)
    put_fn = put
    scannable = (gather_scan_eval if use_gather else scan_eval_step)
    if scannable is not None and scan_k > 1 and n_batches >= scan_k:
        plan = [scan_k] * (n_batches // scan_k)
        if n_batches % scan_k:
            plan.append(n_batches % scan_k)
        it = _scan_groups(it, plan, scan_k)
        first_key = "idx" if use_gather else next(iter(data))
        base_ndim = 1 if use_gather else data[first_key].ndim
        pst = put_stacked if put_stacked is not None else put
        put_fn = (lambda b: pst(b)
                  if b[first_key].ndim == base_ndim + 1 else put(b))
    parts: List[Tuple[object, object, object]] = []
    for dev_batch, _, n_valid in prefetch_batches(it, put_fn):
        if use_gather:
            if isinstance(n_valid, list):
                p, l = gather_scan_eval(state, dev.data, dev_batch["idx"])
            else:
                p, l = gather_eval(state, dev.data, dev_batch["idx"])
        elif isinstance(n_valid, list):
            p, l = scan_eval_step(state, dev_batch)
        else:
            p, l = eval_step(state, dev_batch)
        parts.append((p, l, n_valid))  # defer host sync: keep dispatch full
    fetched = jax.device_get([(p, l) for p, l, _ in parts])
    probs_l, losses_l = [], []
    for (p, l), (_, _, nv) in zip(fetched, parts):
        p, l = np.asarray(p), np.asarray(l)
        for j, n_v in enumerate(nv if isinstance(nv, list) else [nv]):
            probs_l.append(p[j][:n_v] if isinstance(nv, list) else p[:n_v])
            losses_l.append(l[j][:n_v] if isinstance(nv, list) else l[:n_v])
    probs = np.concatenate(probs_l)
    losses = np.concatenate(losses_l)
    labels = data.get("label")
    if labels is None:
        return EvalResult(float("nan"), float("nan"), float("nan"), 0.5, probs)
    labels = np.asarray(labels)
    thr = optimal_threshold_youden(labels, probs)
    pred = (probs > thr).astype(int)
    return EvalResult(float(losses.mean()), accuracy_score(labels, pred),
                      macro_f1(labels, pred), thr, probs)


@dataclasses.dataclass
class FitResult:
    state: object
    best_macro_f1: float
    best_threshold: float
    best_probs: Optional[np.ndarray]
    history: List[Dict]
    # Input-pipeline stall counters (prefetch_batches stats): gets /
    # empty_gets / wait_s, cumulative over the run.
    input_pipeline: Dict[str, float] = dataclasses.field(default_factory=dict)


def fit(state, train_step, eval_step, cfg: TrainConfig,
        train_data: Dict[str, np.ndarray],
        test_data: Optional[Dict[str, np.ndarray]] = None,
        val_data: Optional[Dict[str, np.ndarray]] = None,
        test_ids: Optional[List[str]] = None,
        val_ids: Optional[List[str]] = None,
        fold: int = 0,
        put: Callable = lambda b: b,
        tsv_prefix: Optional[str] = None,
        log_every: int = 10,
        checkpointer=None,
        scan_train_step=None,
        scan_eval_step=None,
        put_stacked: Optional[Callable] = None,
        gather_steps=None,
        dev_train: Optional[DeviceData] = None,
        dev_test: Optional[DeviceData] = None,
        dev_val: Optional[DeviceData] = None,
        packed_plan=None) -> FitResult:
    """Epoch loop with the reference's cadence: loss/LR/grad-norm logging
    every ``log_every`` steps, eval ``cfg.eval_per_epoch`` times per epoch,
    best-test-F1-triggered TSV dump.

    With ``scan_train_step`` (train.step.make_scan_train_step) and
    ``cfg.scan_steps > 1``, full groups of K steps run as ONE device
    dispatch; ``put_stacked`` places a [K, B, ...] batch pytree (under DP it
    must shard axis 1, not axis 0 — parallel.mesh.stacked_batch_sharding).

    With ``gather_steps`` (train.step.GatherSteps) + ``dev_train``/
    ``dev_test``/``dev_val`` (DeviceData) the splits are device-resident:
    batches are row-gathered in HBM and the host ships only int32 indices
    (+ the valid mask) per step — DataConfig.device_resident.

    With ``packed_plan`` (train.packed.PackedTrainPlan) training batches are
    groups of sequence-PACKED rows produced per epoch by the plan (eval
    stays unpacked); ``train_step``/``scan_train_step`` must then be built
    over the packed apply_fn (train.packed.make_packed_text_apply_fn).
    """
    bs = cfg.data.batch_size
    n_train = len(train_data["label"])
    if packed_plan is not None:
        steps_per_epoch = packed_plan.steps_per_epoch
    else:
        steps_per_epoch = (n_train + bs - 1) // bs
    check_interval = max(steps_per_epoch // max(cfg.eval_per_epoch, 1), 1)
    data_rng = np.random.default_rng(cfg.seed + fold)
    dropout_key = jax.random.key(cfg.seed + fold)
    use_gather = gather_steps is not None and dev_train is not None
    if use_gather:
        assert len(dev_train.abs_idx) == n_train
    scan_k = (cfg.scan_steps
              if (scan_train_step is not None
                  or (use_gather and gather_steps.scan_train is not None))
              else 1)
    use_scan = scan_k > 1
    if use_scan and put_stacked is None:
        put_stacked = put

    best_f1, best_thr, best_probs = -1.0, 0.5, None
    history: List[Dict] = []
    # Tag the run_id when distillation is ACTUALLY applied — i.e. teacher
    # soft targets are present in the training rows (the step consumes
    # batch["soft"] only then, train/step.py) — so `combine
    # --group-by-run-id` separates plain vs distilled members as distinct
    # families.  Gating on the data (not cfg.distill_lambda alone) keeps
    # drivers that silently skip distillation (2B, 2C --simple) untagged.
    distilled = (cfg.distill_lambda > 0
                 and ("soft" in train_data
                      or (dev_train is not None
                          and "soft" in dev_train.data)))
    run_id = (f"{cfg.team_name}_{cfg.run_id}"
              + ("_distill" if distilled else ""))
    # Continue the optimizer-step numbering of a restored checkpoint so
    # resumed runs save at monotonically increasing step ids.
    step_count = int(np.asarray(jax.device_get(state.step)))
    # Resume from the interrupted position, not epoch 0: a restored state
    # carries its optimizer step, so completed steps are skipped (replaying
    # them would double-train those batches at the wrong schedule point).
    # The per-epoch data shuffles AND per-dispatch dropout-key splits of the
    # skipped work are consumed so the remaining steps see the exact batch
    # order and dropout keys they would have originally — making a
    # crash+resume run bit-equivalent to an uninterrupted one (the reference
    # has no checkpointing at all; a crash costs a full re-run, SURVEY.md
    # §5.4).  Checkpoints save at eval boundaries and scan groups never
    # straddle them, so a mid-epoch restored step always lands on a dispatch
    # group boundary.
    start_epoch = min(step_count // steps_per_epoch, cfg.epochs)
    resume_bi = step_count - start_epoch * steps_per_epoch

    def _epoch_dispatches() -> int:
        if not use_scan:
            return steps_per_epoch
        plan = _scan_group_plan(steps_per_epoch, check_interval, scan_k,
                                eval_on=test_data is not None)
        return sum(1 if s == scan_k else s for s in plan)

    if start_epoch or resume_bi:
        if start_epoch >= cfg.epochs:
            log.warning(
                "restored step %d already covers all %d epochs "
                "(steps_per_epoch=%d) — nothing to train; increase "
                "cfg.epochs to continue training", step_count, cfg.epochs,
                steps_per_epoch)
        else:
            log.info("resuming at epoch %d batch %d/%d (restored step %d)",
                     start_epoch, resume_bi, steps_per_epoch, step_count)
        for _ in range(start_epoch):
            # Consume exactly what the epoch iterator would have drawn.
            if packed_plan is not None:
                data_rng.permutation(n_train)
            else:
                data_rng.shuffle(np.arange(n_train))
        # Advance the dropout key past the skipped epochs' dispatches in ONE
        # device call (repeated eager splits would cost one dispatch each).
        n_skip = start_epoch * _epoch_dispatches()
        if n_skip:
            dropout_key = jax.jit(lambda k, n: jax.lax.fori_loop(
                0, n, lambda i, c: jax.random.split(c)[0], k))(
                    dropout_key, n_skip)
    if step_count and checkpointer is not None:
        restored = checkpointer.latest_metrics()
        if restored:
            best_f1 = restored.get("test_f1", best_f1)
            best_thr = restored.get("threshold", best_thr)
            log.info("restored best test F1 %.4f (threshold %.4f) — TSVs "
                     "rewrite only on improvement", best_f1, best_thr)
    from mpmc_tpu.utils.profiling import StepTimer
    timer = StepTimer()
    dispatch_no, prof_started, prof_done = 0, False, False
    pf_stats: Dict[str, float] = {}  # input-pipeline stall counters

    # Metric fetches are batched per logging window instead of per step:
    # a per-step float(metrics["loss"]) blocks async dispatch and costs one
    # host round-trip per step (~40 ms over a tunneled link).  Device
    # metrics accumulate in `pending` and are pulled in one device_get at
    # log/eval boundaries; the non-finite failure check (SURVEY.md §5.2-5.3,
    # replacing the reference's try/except tensor dump,
    # textmodel_example_task2A.py:407-413) rides the same cadence — the
    # offending host batch is retained for the postmortem dump.
    pending: List[Tuple[int, int, Dict, Dict[str, np.ndarray]]] = []
    last_grad_norm = 0.0
    losses: List[float] = []

    # Abs→local row lookup for the failure dump: in device-resident mode the
    # per-step host payload is only the {idx, valid} dict, so the offending
    # batch contents are re-materialized from the host-side split arrays.
    local_of = None
    if use_gather and len(dev_train.abs_idx):
        local_of = np.zeros(int(np.max(dev_train.abs_idx)) + 1, np.int64)
        local_of[dev_train.abs_idx] = np.arange(len(dev_train.abs_idx))

    def _dump_payload(host_batch: Dict[str, np.ndarray], j: int) -> Dict:
        payload = {k: np.asarray(v) for k, v in host_batch.items()}
        if local_of is not None and "idx" in payload:
            idx = payload["idx"]
            step_idx = idx[j] if idx.ndim == 2 else idx  # scan group → step j
            payload.update({k: np.asarray(v)[local_of[step_idx]]
                            for k, v in train_data.items()})
            payload["idx"] = step_idx
        return payload

    def flush_metrics():
        nonlocal last_grad_norm
        if not pending:
            return
        fetched = jax.device_get([p[2] for p in pending])
        for (ep, bi_, _, host_batch), m in zip(pending, fetched):
            # Scan-fused groups return stacked [K] metrics; per-step
            # dispatch returns scalars.  bi_ is the LAST step of the group.
            loss_vec = np.atleast_1d(np.asarray(m["loss"], np.float64))
            gnorm_vec = np.atleast_1d(np.asarray(m["grad_norm"], np.float64))
            for j, (loss_val, gnorm) in enumerate(zip(loss_vec, gnorm_vec)):
                if not np.isfinite(loss_val):
                    step_bi = bi_ - (len(loss_vec) - 1 - j)
                    dump = f"nonfinite_fold{fold}_epoch{ep}_batch{step_bi}.npz"
                    np.savez(dump, **_dump_payload(host_batch, j),
                             grad_norm=gnorm)
                    pending.clear()
                    raise FloatingPointError(
                        f"non-finite loss at epoch {ep} batch {step_bi} "
                        f"(grad_norm={gnorm:.3e}); batch dumped to {dump}")
                losses.append(float(loss_val))
            last_grad_norm = float(gnorm_vec[-1])
        pending.clear()

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        losses = []
        # Snapshot so the end-of-epoch log reports THIS epoch's stall
        # numbers, not a run-lifetime average that dilutes a regression.
        pf_at_start = dict(pf_stats)
        if packed_plan is not None:
            step_it = packed_plan.epoch_iter(data_rng)
            key_field = "label"
        elif use_gather:
            # Only the shuffled row indices (and the valid mask) leave the
            # host; batch pixels/tokens are gathered from HBM in-step.
            step_it = batch_iter(
                {"idx": dev_train.abs_idx.astype(np.int32)}, bs,
                shuffle=True, rng=data_rng, with_valid=True)
            key_field = "idx"
        else:
            step_it = batch_iter(train_data, bs, shuffle=True, rng=data_rng,
                                 with_valid=True)
            key_field = "label"
        if use_scan:
            plan = _scan_group_plan(steps_per_epoch, check_interval, scan_k,
                                    eval_on=test_data is not None)
            grouped = _scan_groups(step_it, plan, scan_k)
            base_ndim = 1 if (use_gather or packed_plan is not None) \
                else train_data[key_field].ndim
            put_fn = (lambda b: put_stacked(b)
                      if b[key_field].ndim == base_ndim + 1 else put(b))
        else:
            grouped, put_fn = step_it, put
        bi = 0
        for dev_batch, host_batch, n_valid in prefetch_batches(
                grouped, put_fn, stats=pf_stats):
            group_size = len(n_valid) if isinstance(n_valid, list) else 1
            if epoch == start_epoch and bi + group_size <= resume_bi:
                # Mid-epoch resume: replay the pre-crash prefix without
                # training — consume the batch and its dropout split so the
                # post-resume steps match the uninterrupted run exactly.
                dropout_key, _ = jax.random.split(dropout_key)
                bi += group_size
                continue
            if cfg.profile_dir and epoch == 0 and not prof_done:
                # Trace dispatches 3-5: dispatch 1 carries the XLA compile,
                # 2 the device warm-up — 3+ are steady state.
                dispatch_no += 1
                if dispatch_no == 3 and not prof_started:
                    jax.profiler.start_trace(cfg.profile_dir)
                    prof_started = True
                elif dispatch_no == 6 and prof_started:
                    flush_metrics()  # sync so the traced work has retired
                    jax.profiler.stop_trace()
                    prof_done = True
                    log.info("profiler trace written to %s", cfg.profile_dir)
            dropout_key, sub = jax.random.split(dropout_key)
            if use_gather and packed_plan is not None:
                # Packed device-resident (train.packed.PackedMultimodalPlan
                # with resident_images): the batch carries packed token rows
                # + img_idx; pixels are gathered HBM→HBM in-step.
                fn = (gather_steps.scan_train if group_size > 1
                      else gather_steps.train)
                state, metrics = fn(state, dev_train.data, dev_batch, sub)
            elif use_gather:
                fn = (gather_steps.scan_train if group_size > 1
                      else gather_steps.train)
                state, metrics = fn(state, dev_train.data, dev_batch["idx"],
                                    dev_batch["valid"], sub)
            elif group_size > 1:
                state, metrics = scan_train_step(state, dev_batch, sub)
            else:
                state, metrics = train_step(state, dev_batch, sub)
            prev_bi, bi = bi, bi + group_size
            step_count += group_size
            timer.tick(group_size)
            pending.append((epoch, bi, metrics, host_batch))
            if bi // log_every > prev_bi // log_every:
                flush_metrics()
                log.info(
                    "TRAIN | Epoch [%d] | Batch [%d/%d] | Loss: %.4f | "
                    "Grad Norm: %.4f", epoch, bi, steps_per_epoch,
                    np.mean(losses[-log_every:]), last_grad_norm)

            if test_data is not None and (bi % check_interval == 0
                                          or bi == steps_per_epoch):
                flush_metrics()

                def _eval(split_data, dev_split):
                    return run_eval(
                        state, eval_step, split_data, bs, put,
                        scan_eval_step=scan_eval_step,
                        scan_k=cfg.scan_steps, put_stacked=put_stacked,
                        gather_eval=(gather_steps.eval
                                     if use_gather else None),
                        gather_scan_eval=(gather_steps.scan_eval
                                          if use_gather else None),
                        dev=dev_split)

                t_res = _eval(test_data, dev_test)
                history.append({"epoch": epoch, "batch": bi,
                                "test_f1": t_res.macro_f1,
                                "test_loss": t_res.loss})
                log.info(" TEST | Epoch [%d] | Batch [%d/%d] | Loss: %.4f | "
                         "Acc: %.4f | F1: %.4f | thresh: %.4f", epoch, bi,
                         steps_per_epoch, t_res.loss, t_res.accuracy,
                         t_res.macro_f1, t_res.threshold)
                v_res = None
                if val_data is not None:
                    v_res = _eval(val_data, dev_val)
                    log.info("  VAL | Epoch [%d] | F1: %.4f", epoch,
                             v_res.macro_f1)
                if t_res.macro_f1 > best_f1:
                    best_f1 = t_res.macro_f1
                    best_thr = (cfg.emit_threshold
                                if cfg.emit_threshold is not None
                                else t_res.threshold)
                    best_probs = t_res.probs
                    if tsv_prefix and test_ids is not None:
                        pred = (t_res.probs > best_thr).astype(int)
                        write_label_tsv(f"{tsv_prefix}.tsv", test_ids, pred,
                                        run_id)
                        write_prob_tsv(f"{tsv_prefix}_probs_fold_{fold}.tsv",
                                       test_ids, pred, t_res.probs, run_id,
                                       prob_header=cfg.prob_header)
                        if (cfg.emit_val_tsv and v_res is not None
                                and val_ids is not None):
                            vthr = (cfg.emit_threshold
                                    if cfg.emit_threshold is not None
                                    else v_res.threshold)
                            vpred = (v_res.probs > vthr).astype(int)
                            write_prob_tsv(
                                f"{tsv_prefix}_val_fold_{fold}.tsv",
                                val_ids, vpred, v_res.probs, run_id,
                                prob_header=cfg.prob_header)
                    if checkpointer is not None:
                        checkpointer.save(state, step=step_count,
                                          metrics={"test_f1": best_f1,
                                                   "threshold": best_thr})
        flush_metrics()
        stats = timer.stats(batch_size=bs)
        gets = int(pf_stats.get("gets", 0) - pf_at_start.get("gets", 0))
        wait_s = pf_stats.get("wait_s", 0.0) - pf_at_start.get("wait_s", 0.0)
        empty = int(pf_stats.get("empty_gets", 0)
                    - pf_at_start.get("empty_gets", 0))
        log.info("TRAIN | Epoch [%d] done in %.1fs | loss %.4f | "
                 "%.1f items/s (p50 %.0f ms/step) | input-wait %.2f ms/"
                 "dispatch (%d/%d empty gets)", epoch,
                 time.time() - t0, float(np.mean(losses)),
                 stats.get("items_per_sec", 0.0),
                 stats.get("step_ms_p50", 0.0),
                 1e3 * wait_s / max(gets, 1), empty, gets)

    return FitResult(state, best_f1, best_thr, best_probs, history,
                     input_pipeline=dict(pf_stats))
