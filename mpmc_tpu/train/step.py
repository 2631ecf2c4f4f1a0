"""Jitted train/eval steps: bf16 policy, focal/CE loss, grouped-LR Adam,
linear-warmup schedule, global-norm clipping.

TPU-first replacement for the reference's custom loop internals
(``Multimodal_example_task2C.py:689-776``): torch AMP fp16 + GradScaler become
a bf16 compute policy (no loss scaling needed on TPU), the three Adam
parameter groups (fusion@lr, text@0.8lr, image@0.8lr, ``:645-664``) become an
``optax.multi_transform`` keyed on parameter paths, HF's
``get_linear_schedule_with_warmup`` (``:170-174``) is an optax schedule, and
the unclipped-grad-norm probe + clip-at-1.0 (``:713-715``) is
``optax.clip_by_global_norm`` with the pre-clip norm reported in metrics.

The returned step functions are pure and jit-compiled once; under a data-axis
mesh the batch arrives sharded and XLA inserts the gradient all-reduce
(psum over ICI) automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mpmc_tpu.config import LossType, TrainConfig
from mpmc_tpu.ops.losses import sigmoid_focal_loss, softmax_cross_entropy
from mpmc_tpu.train import sparse_opt
from mpmc_tpu.utils.tree import path_str


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def linear_warmup_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """HF ``get_linear_schedule_with_warmup`` semantics: ramp 0→lr over
    ``warmup_steps``, then linear decay to 0 at ``total_steps``."""
    warmup_steps = max(warmup_steps, 0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(warmup_steps, 1)
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1))
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def _param_group(path: Tuple) -> str:
    """Reference ``get_params`` grouping (:645-664): any parameter whose path
    mentions text_model/caption_text_model/image_model gets the 0.8× encoder
    LR; fusion + heads get the base LR."""
    joined = path_str(path)
    if "text_model" in joined or "image_model" in joined:
        return "encoder"
    return "head"


def make_optimizer(cfg: TrainConfig, total_steps: int,
                   embed_support: Optional[int] = None
                   ) -> optax.GradientTransformation:
    if cfg.lr_schedule == "constant":
        # Reference 2A recipe: ``scheduler = None``
        # (textmodel_example_task2A.py:574-576) — flat base LR, no decay.
        # Expressed as a schedule (not a float) so the optax state tree has
        # the same structure either way — checkpoints restore across
        # schedule settings.
        head_sched = optax.constant_schedule(cfg.learning_rate)
        enc_sched = optax.constant_schedule(
            cfg.learning_rate * cfg.encoder_lr_scale)
    elif cfg.lr_schedule == "linear_warmup":
        warmup = int(cfg.warmup_fraction * total_steps)
        head_sched = linear_warmup_schedule(cfg.learning_rate, warmup,
                                            total_steps)
        enc_sched = linear_warmup_schedule(
            cfg.learning_rate * cfg.encoder_lr_scale, warmup, total_steps)
    else:
        raise ValueError(f"unknown lr_schedule: {cfg.lr_schedule!r} "
                         "(expected 'linear_warmup' or 'constant')")
    mu_dtype = cfg.adam_mu_dtype  # e.g. "bfloat16" halves mu HBM traffic
    transforms = {"head": optax.adam(head_sched, mu_dtype=mu_dtype),
                  "encoder": optax.adam(enc_sched, mu_dtype=mu_dtype)}
    embed_mode = cfg.embedding_optimizer
    if embed_mode == "factored":
        # The word-embedding tables get momentum-free factored-RMS: the
        # Adafactor second-moment accumulator ([V]+[H] row/col factors
        # instead of a [V,H] nu, and no mu at all), at the encoder-group
        # schedule.  On the HBM-bound bs16 step this removes ~2 of the 7
        # f32 array passes over ~45% of the parameter mass.
        transforms["embed"] = optax.chain(
            optax.scale_by_factored_rms(),
            optax.scale_by_learning_rate(enc_sched))
    elif embed_mode == "sparse":
        # Lazy row-Adam (train/sparse_opt.py): the tables' grads pass the
        # clip + multi_transform untouched, then the wrapper below swaps
        # them for K-row SparseRows updates — only the touched vocab rows
        # are read/written anywhere in the optimizer.
        transforms["embed"] = optax.identity()

    def _label(path):
        joined = path_str(path)
        if embed_mode != "adam" and "word_embeddings" in joined:
            return "embed"
        return _param_group(path)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.multi_transform(
            transforms,
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: _label(path), params)),
    )
    if embed_mode == "sparse":
        from mpmc_tpu.train.sparse_opt import with_sparse_embeddings
        if embed_support is not None:
            # Exact bound supplied by the driver from the REALIZED batch
            # shapes (post-bucketing: batch_size × bucketed seq len) — the
            # gather/scatter K tracks the true per-step support instead of
            # the config cap (4× smaller at the corpus bucket of 128 vs the
            # 512 cap).  support_rows only sizes per-step temporaries, so
            # checkpoints are interchangeable across values.  The config
            # value stays an escape-hatch floor: an explicit
            # --embedding-support-rows is never silently dropped.
            support = max(cfg.embedding_support_rows, int(embed_support))
        else:
            # One step can touch at most batch_size × padded-seq-len
            # distinct rows per table; take the config's upper bound
            # (bucketing only shrinks it) so no gradient row is skipped.
            rows = max(cfg.data.batch_size, cfg.data.pack_rows)
            per_step = rows * max(cfg.model.max_text_len or 1,
                                  cfg.model.max_caption_len or 1)
            support = max(cfg.embedding_support_rows, per_step)
        tx = with_sparse_embeddings(tx, enc_sched, support_rows=support)
    return tx


def create_train_state(variables: Dict, tx: optax.GradientTransformation
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    ), tx


def _cast_floats(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


ApplyFn = Callable[..., Any]


def build_train_step_fn(apply_fn: ApplyFn, cfg: TrainConfig,
                        tx: optax.GradientTransformation,
                        class_weights: Optional[jnp.ndarray] = None):
    """Build the raw (unjitted) train step — also the unit that fold-parallel
    training vmaps over a stacked-parameters axis (parallel.fold_parallel).

    ``apply_fn(variables, batch, train, rngs, mutable)`` must run the model and
    return ``(outputs, mutated_vars)``: outputs [B] (single logit) or [B, C].
    """
    compute_dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32

    def loss_from_outputs(outputs, labels, valid=None, soft=None):
        """Mean loss over the *valid* rows only: replicated padding rows in
        the static-shape final batch (train.loop.batch_iter) carry zero
        weight, matching the reference's smaller-final-batch semantics.

        With ``soft`` (per-row teacher P(propaganda), train/distill.py) and
        ``cfg.distill_lambda`` > 0 the per-row loss becomes
        ``(1-λ)·loss(hard) + λ·CE(soft)`` — classic→neural distillation;
        eval and TSV emission stay purely neural."""
        outputs = outputs.astype(jnp.float32)
        if cfg.loss == LossType.FOCAL:
            vec = sigmoid_focal_loss(outputs, labels.astype(jnp.float32),
                                     alpha=cfg.focal_alpha,
                                     gamma=cfg.focal_gamma, reduction="none")
            w = valid
        else:
            vec = softmax_cross_entropy(outputs, labels, reduction="none")
            cw = class_weights if cfg.use_class_weights else None
            if cw is None:
                w = valid
            else:  # torch weighted-mean: normalize by the sum of weights
                w = cw[labels] if valid is None else cw[labels] * valid
        if soft is not None and cfg.distill_lambda > 0:
            q = soft.astype(jnp.float32)
            if outputs.ndim == 1:  # single-logit sigmoid head
                logp1 = jax.nn.log_sigmoid(outputs)
                logp0 = jax.nn.log_sigmoid(-outputs)
            elif outputs.shape[-1] == 2:
                logp = jax.nn.log_softmax(outputs, axis=-1)
                logp1, logp0 = logp[:, 1], logp[:, 0]
            else:
                raise ValueError("distill_lambda requires a binary head "
                                 f"(got outputs {outputs.shape})")
            vec_soft = -(q * logp1 + (1.0 - q) * logp0)
            lam = cfg.distill_lambda
            vec = (1.0 - lam) * vec + lam * vec_soft
        if w is None:
            return jnp.mean(vec)
        w = w.astype(jnp.float32)
        return jnp.sum(vec * w) / jnp.maximum(jnp.sum(w), 1e-9)

    def step_fn(state: TrainState, batch: Dict, dropout_rng: jax.Array):
        drop_key, aug_key = jax.random.split(dropout_rng)
        valid = batch.get("valid")  # static presence check at trace time
        soft = batch.get("soft")    # distillation targets (train/distill.py)

        def loss_fn(params):
            variables = {"params": _cast_floats(params, compute_dtype),
                         "batch_stats": state.batch_stats}
            cast_batch = {
                k: (v.astype(compute_dtype)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v)
                for k, v in batch.items() if k not in ("valid", "soft")}
            outputs, mutated = apply_fn(
                variables, cast_batch, train=True,
                rngs={"dropout": drop_key, "augment": aug_key},
                mutable=["batch_stats"])
            loss = loss_from_outputs(outputs, batch["label"], valid, soft)
            return loss, mutated.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = _cast_floats(grads, jnp.float32)
        grad_norm = optax.global_norm(grads)  # pre-clip probe (reference :713)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = sparse_opt.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=_cast_floats(new_stats, jnp.float32),
                               opt_state=new_opt)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return new_state, metrics

    return step_fn


def make_train_step(apply_fn: ApplyFn, cfg: TrainConfig,
                    tx: optax.GradientTransformation,
                    class_weights: Optional[jnp.ndarray] = None,
                    donate: bool = True):
    """Jitted train step (donated state → in-place buffer reuse on device)."""
    step_fn = build_train_step_fn(apply_fn, cfg, tx, class_weights)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_scan_train_step(apply_fn: ApplyFn, cfg: TrainConfig,
                         tx: optax.GradientTransformation,
                         class_weights: Optional[jnp.ndarray] = None,
                         scan_steps: Optional[int] = None,
                         donate: bool = True):
    """K optimizer steps fused into ONE jitted dispatch via ``lax.scan``.

    Each executable launch on a remote/tunneled TPU costs a host round-trip
    that per-step dispatch cannot hide (measured ~40 ms/launch here, vs
    ~7 ms device compute for the bucketed flagship step).  Scanning
    ``cfg.scan_steps`` steps inside one jit pays that cost once per K steps
    — the TPU-idiomatic "steps per host loop" pattern.  The scanned batch
    pytree carries a leading K axis (stack K per-step batches); metrics come
    back stacked ``[K]`` so the loop's windowed fetch still sees every
    per-step loss/grad-norm.  The reference dispatches (and host-syncs)
    every step individually (``Multimodal_example_task2C.py:689-776``).
    """
    k = int(scan_steps if scan_steps is not None else cfg.scan_steps)
    if k < 2:
        raise ValueError(f"scan_steps must be >= 2, got {k}")
    step_fn = build_train_step_fn(apply_fn, cfg, tx, class_weights)

    def scan_fn(state: TrainState, batches: Dict, dropout_rng: jax.Array):
        keys = jax.random.split(dropout_rng, k)

        def body(st, xs):
            b, kk = xs
            return step_fn(st, b, kk)

        return jax.lax.scan(body, state, (batches, keys))

    return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())


@dataclasses.dataclass
class GatherSteps:
    """The four jitted step variants over a device-resident dataset
    (DataConfig.device_resident): per-step and scan-fused, train and eval."""
    train: Callable
    eval: Callable
    scan_train: Optional[Callable] = None
    scan_eval: Optional[Callable] = None


def _gather_rows(data: Dict, idx: jax.Array) -> Dict:
    """Assemble a batch on device: row-gather every array of a resident
    dataset pytree by [B] int32 indices (HBM→HBM, ~µs) instead of shipping
    batch bytes over the host link every step (DataConfig.device_resident)."""
    return jax.tree_util.tree_map(lambda a: a[idx], data)


def make_gather_train_step(apply_fn: ApplyFn, cfg: TrainConfig,
                           tx: optax.GradientTransformation,
                           class_weights: Optional[jnp.ndarray] = None,
                           donate: bool = True):
    """Train step over a device-resident dataset: ``(state, data, idx,
    valid, rng)`` where ``data`` is the full split resident in HBM and
    ``idx`` selects the batch rows on device."""
    step_fn = build_train_step_fn(apply_fn, cfg, tx, class_weights)

    def fn(state: TrainState, data: Dict, idx: jax.Array,
           valid: jax.Array, rng: jax.Array):
        batch = dict(_gather_rows(data, idx), valid=valid)
        return step_fn(state, batch, rng)

    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_gather_scan_train_step(apply_fn: ApplyFn, cfg: TrainConfig,
                                tx: optax.GradientTransformation,
                                class_weights: Optional[jnp.ndarray] = None,
                                scan_steps: Optional[int] = None,
                                donate: bool = True):
    """Scan-fused K steps over a device-resident dataset: per dispatch the
    host ships only ``idx [K, B]`` + ``valid [K, B]`` (~KB)."""
    k = int(scan_steps if scan_steps is not None else cfg.scan_steps)
    if k < 2:
        raise ValueError(f"scan_steps must be >= 2, got {k}")
    step_fn = build_train_step_fn(apply_fn, cfg, tx, class_weights)

    def scan_fn(state: TrainState, data: Dict, idx: jax.Array,
                valid: jax.Array, dropout_rng: jax.Array):
        keys = jax.random.split(dropout_rng, k)

        def body(st, xs):
            ib, vb, kk = xs
            return step_fn(st, dict(_gather_rows(data, ib), valid=vb), kk)

        return jax.lax.scan(body, state, (idx, valid, keys))

    return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())


def make_packed_gather_train_step(apply_fn: ApplyFn, cfg: TrainConfig,
                                  tx: optax.GradientTransformation,
                                  class_weights: Optional[jnp.ndarray] = None,
                                  donate: bool = True):
    """Packed-multimodal train step over a device-resident image store:
    ``(state, data, batch, rng)`` where ``batch`` carries the host-packed
    text/caption rows plus ``img_idx`` [B] int32, and the pixel rows are
    gathered HBM→HBM from ``data["image"]`` (train.packed.
    PackedMultimodalPlan with ``resident_images``) — packing keeps the
    device-resident property of DataConfig.device_resident instead of
    silently falling back to streaming uint8 pixels from the host."""
    step_fn = build_train_step_fn(apply_fn, cfg, tx, class_weights)

    def fn(state: TrainState, data: Dict, batch: Dict, rng: jax.Array):
        b = dict(batch)
        b["image"] = data["image"][b.pop("img_idx")]
        return step_fn(state, b, rng)

    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_packed_gather_scan_train_step(
        apply_fn: ApplyFn, cfg: TrainConfig,
        tx: optax.GradientTransformation,
        class_weights: Optional[jnp.ndarray] = None,
        scan_steps: Optional[int] = None, donate: bool = True):
    """Scan-fused K packed steps over a device-resident image store: per
    dispatch the host ships only the stacked packed token rows + ``img_idx``
    [K, B] (~KB) — see make_packed_gather_train_step."""
    k = int(scan_steps if scan_steps is not None else cfg.scan_steps)
    if k < 2:
        raise ValueError(f"scan_steps must be >= 2, got {k}")
    step_fn = build_train_step_fn(apply_fn, cfg, tx, class_weights)

    def scan_fn(state: TrainState, data: Dict, batches: Dict,
                dropout_rng: jax.Array):
        keys = jax.random.split(dropout_rng, k)

        def body(st, xs):
            b, kk = xs
            bb = dict(b)
            bb["image"] = data["image"][bb.pop("img_idx")]
            return step_fn(st, bb, kk)

        return jax.lax.scan(body, state, (batches, keys))

    return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())


def make_gather_eval_step(apply_fn: ApplyFn, cfg: TrainConfig):
    """Eval step over a device-resident dataset (see make_gather_train_step)."""
    fn = _build_eval_fn(apply_fn, cfg)

    def e(state: TrainState, data: Dict, idx: jax.Array):
        return fn(state, _gather_rows(data, idx))

    return jax.jit(e)


def make_gather_scan_eval_step(apply_fn: ApplyFn, cfg: TrainConfig):
    """Eval over [G, B] index groups of a device-resident dataset in one
    dispatch (lax.map)."""
    fn = _build_eval_fn(apply_fn, cfg)

    def scanned(state: TrainState, data: Dict, idx: jax.Array):
        return jax.lax.map(
            lambda ib: fn(state, _gather_rows(data, ib)), idx)

    return jax.jit(scanned)


def make_eval_step(apply_fn: ApplyFn, cfg: TrainConfig):
    """Jitted eval step → per-sample propaganda probability [B] plus the
    per-sample loss contribution (for the reference's test-loss logging)."""
    return jax.jit(_build_eval_fn(apply_fn, cfg))


def make_scan_eval_step(apply_fn: ApplyFn, cfg: TrainConfig):
    """Eval over a stacked [K, B, ...] batch group in ONE dispatch
    (``lax.map`` — body compiled once, trip count static).  Same
    launch-amortization rationale as make_scan_train_step: a full eval pass
    is otherwise ceil(N/B) separate launches, each costing a host
    round-trip.  Returns stacked ``(probs [K, B], loss [K, B])``."""
    fn = _build_eval_fn(apply_fn, cfg)

    def scanned(state: TrainState, batches: Dict):
        return jax.lax.map(lambda b: fn(state, b), batches)

    return jax.jit(scanned)


def _build_eval_fn(apply_fn: ApplyFn, cfg: TrainConfig):
    compute_dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32

    def step_fn(state: TrainState, batch: Dict):
        variables = {"params": _cast_floats(state.params, compute_dtype),
                     "batch_stats": state.batch_stats}
        cast_batch = {
            k: (v.astype(compute_dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v)
            for k, v in batch.items()}
        outputs, _ = apply_fn(variables, cast_batch, train=False,
                              rngs=None, mutable=[])
        outputs = outputs.astype(jnp.float32)
        if outputs.ndim == 1:
            probs = jax.nn.sigmoid(outputs)
            if "label" in batch:
                loss = sigmoid_focal_loss(
                    outputs, batch["label"].astype(jnp.float32),
                    alpha=cfg.focal_alpha, gamma=cfg.focal_gamma,
                    reduction="none")
            else:
                loss = jnp.zeros_like(probs)
        else:
            probs = jax.nn.softmax(outputs, axis=-1)[:, 1]
            if "label" in batch:
                loss = softmax_cross_entropy(outputs, batch["label"],
                                             reduction="none")
            else:
                loss = jnp.zeros_like(probs)
        return probs, loss

    return step_fn
