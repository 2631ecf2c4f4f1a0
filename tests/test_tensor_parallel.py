"""Tensor parallelism (parallel/tp.py): Megatron-style weight sharding over
the `model` mesh axis, validated on the virtual 8-device CPU mesh.

SPMD sharding is semantics-preserving — the checks here are (a) the rules
actually shard the transformer weights, (b) the sharded step computes the
same numbers as the replicated one, and (c) mesh/axis plumbing composes
with DP."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mpmc_tpu.config import (DataConfig, LossType, MeshConfig, ModelConfig,
                             TrainConfig)
from mpmc_tpu.models import TextClassifier
from mpmc_tpu.parallel.mesh import batch_sharding, make_mesh
from mpmc_tpu.parallel.tp import count_sharded, shard_state, spec_for_path
from mpmc_tpu.train.step import (build_train_step_fn, create_train_state,
                                 make_optimizer)


def _text_setup(rng, batch=16):
    mcfg = dc.replace(ModelConfig.tiny_2c(), num_classes=2)
    # f32 so the parity check isolates SPMD partitioning from bf16
    # partial-sum rounding (the sharded contraction reduces in a
    # different order; at bf16 that is ~1e-3 on the loss).
    cfg = TrainConfig(model=mcfg, data=DataConfig(batch_size=batch),
                      loss=LossType.CROSS_ENTROPY, learning_rate=1e-3,
                      epochs=1, bf16=False)
    model = TextClassifier(mcfg)
    ids = rng.integers(5, mcfg.text.vocab_size, (batch, 16)).astype(np.int32)
    mask = np.ones_like(ids)
    y = (rng.random(batch) > 0.5).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])

    def apply_fn(variables, batch, train, rngs, mutable):
        logits = model.apply(variables, batch["text_ids"],
                             batch["text_mask"], train=train, rngs=rngs)
        return logits, {}

    batch_d = {"text_ids": ids, "text_mask": mask, "label": y,
               "valid": np.ones(batch, np.float32)}
    tx = make_optimizer(cfg, total_steps=10)
    state, tx = create_train_state(variables, tx)
    step_fn = build_train_step_fn(apply_fn, cfg, tx)
    return cfg, state, step_fn, batch_d


def test_spec_rules_match_bert_paths():
    """The path rules hit the intended transformer leaves and nothing
    fundamental else (embeddings/LayerNorms replicate)."""
    mesh = make_mesh(MeshConfig(num_data_shards=4, num_model_shards=2))
    _, state, _, _ = _text_setup(np.random.default_rng(0))
    tp_state = shard_state(state, mesh)
    flat = jax.tree_util.tree_flatten_with_path(tp_state.params)[0]
    by_path = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
               for path, leaf in flat}
    enc = "encoder/layer_0"
    assert by_path[f"{enc}/attention/query/kernel"].sharding.spec == \
        P(None, "model", None)
    assert by_path[f"{enc}/attention/out/kernel"].sharding.spec == \
        P("model", None, None)
    assert by_path[f"{enc}/intermediate/kernel"].sharding.spec == \
        P(None, "model")
    assert by_path[f"{enc}/output/kernel"].sharding.spec == P("model", None)
    assert by_path["encoder/word_embeddings/embedding"].sharding.spec == \
        P("model", None)  # vocab-parallel: the largest tensors in the model
    assert by_path[f"{enc}/attention_ln/scale"].sharding.spec == P()
    # the bare classification head named "output" is NOT an encoder MLP-out:
    # it must replicate (anchored layer_\d+ rule), no per-step all-reduce
    assert by_path["output/kernel"].sharding.spec == P()
    # optimizer state mirrors the params → sharded too
    assert count_sharded(tp_state.params) >= 4 * 2 * 2  # 4 rules x 2 layers
    assert count_sharded(tp_state.opt_state) >= count_sharded(
        tp_state.params)


def test_tp_step_matches_replicated():
    """One optimizer step on the (data=4, model=2) mesh computes the same
    loss and the same updated params as the fully replicated step."""
    rng = np.random.default_rng(1)
    cfg, state, step_fn, batch = _text_setup(rng)
    step = jax.jit(step_fn)
    key = jax.random.PRNGKey(7)

    ref_state, ref_m = step(state, batch, key)
    mesh = make_mesh(MeshConfig(num_data_shards=4, num_model_shards=2))
    tp_state = shard_state(state, mesh)
    bsh = batch_sharding(mesh)
    tp_batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    tp_state2, tp_m = step(tp_state, tp_batch, key)

    assert np.isfinite(float(tp_m["loss"]))
    np.testing.assert_allclose(float(tp_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    # updated weights identical (reduction-order tolerance)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    tp_leaves = jax.tree_util.tree_leaves(tp_state2.params)
    for a, b in zip(ref_leaves, tp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)
    # and the weights stayed sharded through the step (no silent gather to
    # replicated; XLA may propagate sharding to MORE leaves, e.g. biases)
    assert count_sharded(tp_state2.params) >= count_sharded(tp_state.params)


def test_tp_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(num_fold_shards=2, num_model_shards=2))
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(num_data_shards=8, num_model_shards=2))
    mesh = make_mesh(MeshConfig(num_data_shards=2, num_model_shards=2))
    assert dict(mesh.shape) == {"data": 2, "model": 2}
    # unspecified dp → the whole machine, not a stranded 1 x model corner
    mesh = make_mesh(MeshConfig(num_model_shards=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_tp_factored_optimizer_state_replicates():
    """Factored-RMS embedding accumulators (v_row [H] / v_col [V]) live at
    paths matching the embedding rule but at lower rank — they must
    replicate, not crash device_put (regression: --model-shards with
    --embedding-optimizer factored)."""
    mesh = make_mesh(MeshConfig(num_data_shards=4, num_model_shards=2))
    rng = np.random.default_rng(5)
    mcfg = dc.replace(ModelConfig.tiny_2c(), num_classes=2)
    cfg = TrainConfig(model=mcfg, data=DataConfig(batch_size=8),
                      loss=LossType.CROSS_ENTROPY,
                      embedding_optimizer="factored")
    model = TextClassifier(mcfg)
    ids = rng.integers(5, mcfg.text.vocab_size, (1, 16)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), ids, np.ones_like(ids))
    tx = make_optimizer(cfg, total_steps=10)
    state, _ = create_train_state(variables, tx)
    tp_state = shard_state(state, mesh)  # must not raise
    assert count_sharded(tp_state.params) > 0


def test_tp_indivisible_leaf_replicates():
    """A matching leaf whose dim does not divide the axis extent falls back
    to replication (warning) instead of crashing."""
    mesh = make_mesh(MeshConfig(num_data_shards=1, num_model_shards=8))
    # heads=4 on tiny config do not divide model=8 → qkv kernels replicate
    _, state, _, _ = _text_setup(np.random.default_rng(2))
    tp_state = shard_state(state, mesh)
    flat = jax.tree_util.tree_flatten_with_path(tp_state.params)[0]
    for path, leaf in flat:
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        if s.endswith("attention/query/kernel"):
            assert leaf.sharding.spec == P()  # 4 heads % 8 != 0
        if s.endswith("intermediate/kernel"):
            assert leaf.sharding.spec == P(None, "model")  # 128 % 8 == 0


@pytest.mark.slow
def test_tp_driver_end_to_end(tmp_path):
    """_run_folds with MeshConfig(num_data_shards=4, num_model_shards=2)
    (the `train --data-shards 4 --model-shards 2` path): the fold trains
    under TP sharding and still learns."""
    import numpy as np
    from mpmc_tpu.cli.experiments import _run_folds
    from mpmc_tpu.config import LossType, PoolingType

    rng = np.random.default_rng(3)
    mcfg = dc.replace(ModelConfig.tiny_2c(), num_classes=2,
                      pooling=PoolingType.ATTENTION)
    cfg = TrainConfig(model=mcfg,
                      data=DataConfig(batch_size=16, num_folds=2),
                      mesh=MeshConfig(num_data_shards=4, num_model_shards=2),
                      epochs=8, loss=LossType.CROSS_ENTROPY,
                      learning_rate=3e-3, scan_steps=2)
    n = 64
    y = (rng.random(n) > 0.5).astype(np.int32)
    ids_arr = rng.integers(5, mcfg.text.vocab_size, (n, 16)).astype(np.int32)
    ids_arr[:, 0] = y * 3 + 1
    data = {"text_ids": ids_arr, "text_mask": np.ones_like(ids_arr),
            "label": y}
    res = _run_folds(cfg, lambda: TextClassifier(mcfg), "text", data,
                     [f"d/x_{i}.jpg" for i in range(n)], None, None,
                     str(tmp_path), "task2X", folds=[0])
    assert res.fold_results[0].best_macro_f1 > 0.8


@pytest.mark.slow  # heavy parity: covered by the per-round --runslow suite
def test_tp_checkpoint_restores_unsharded(tmp_path):
    """A checkpoint saved from a TP-sharded TrainState restores into an
    unsharded template byte-equal (orbax resolves shardings on read), so
    predict can always consume TP-trained checkpoints."""
    from mpmc_tpu.train.checkpoint import Checkpointer
    _, state, _, _ = _text_setup(np.random.default_rng(4))
    mesh = make_mesh(MeshConfig(num_data_shards=4, num_model_shards=2))
    tp_state = shard_state(state, mesh)
    cp = Checkpointer(str(tmp_path))
    cp.save(tp_state, 1)
    cp.wait()
    restored = cp.restore_latest(state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_rules_cover_vit():
    """The ViT rules shard q/k/v/out/mlp kernels inside layer blocks, so
    --model-shards is not a silent no-op for the 2B image zoo."""
    from mpmc_tpu.models.vit import ViT
    mesh = make_mesh(MeshConfig(num_data_shards=4, num_model_shards=2))
    vit = ViT(hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64,
              patch_size=16)
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = vit.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    specs = {}
    for path, leaf in flat:
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        specs[s] = spec_for_path(path)
    assert specs["layer_0/q/kernel"] == P(None, "model", None)
    assert specs["layer_0/out/kernel"] == P("model", None, None)
    assert specs["layer_0/mlp1/kernel"] == P(None, "model")
    assert specs["layer_0/mlp2/kernel"] == P("model", None)
    assert specs["patch_embed/kernel"] == P()  # conv stays replicated
    assert specs["ln_final/scale"] == P()
    # and a full state actually shards + steps on the mesh
    from mpmc_tpu.parallel.tp import count_sharded, shard_state
    import optax
    tx = optax.adam(1e-3)
    from mpmc_tpu.train.step import create_train_state
    state, _ = create_train_state(variables, tx)
    tp_state = shard_state(state, mesh)
    assert count_sharded(tp_state.params) >= 6 * 2  # 6 rules x 2 layers


def test_tp_composes_with_fold_parallel_3d_mesh():
    """3-D (fold=2, data=2, model=2) composition (VERDICT r3 #6): stacked
    per-fold states with each fold's transformer weights Megatron-sharded
    over `model`, per-fold batches over `data` — one vmapped step executes
    and both fold and model shardings survive."""
    from jax.sharding import Mesh

    from mpmc_tpu.parallel.fold_parallel import stack_states

    rng = np.random.default_rng(7)
    cfg, state, step_fn, batch_d = _text_setup(rng)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("fold", "data", "model"))
    stacked = stack_states([state, state])
    stacked = shard_state(stacked, mesh, leading_axes=("fold",))
    n_tp = count_sharded(stacked.params)
    assert n_tp > 0
    # every param leaf carries the fold axis too
    for leaf in jax.tree_util.tree_leaves(stacked.params):
        assert leaf.sharding.spec and leaf.sharding.spec[0] == "fold"
    fold_batch = jax.device_put(
        jax.tree_util.tree_map(lambda x: np.stack([x, x]), batch_d),
        NamedSharding(mesh, P("fold", "data")))
    keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), 2),
                          NamedSharding(mesh, P("fold")))
    comp = jax.jit(jax.vmap(step_fn))
    new_stacked, metrics = comp(stacked, fold_batch, keys)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert count_sharded(new_stacked.params) >= n_tp
    # parity vs the plain unsharded step (fold 0 == fold 1 == single)
    _, ref_metrics = jax.jit(step_fn)(state, batch_d,
                                      jax.random.PRNGKey(0))
    # folds used different rng keys; just check the sharded computation is
    # the same program: rerun fold-0's key on the plain step
    _, m0 = jax.jit(step_fn)(state, batch_d,
                             jax.random.split(jax.random.PRNGKey(0), 2)[0])
    np.testing.assert_allclose(float(np.asarray(metrics["loss"])[0]),
                               float(m0["loss"]), rtol=1e-5)
