"""Pipeline parallelism (parallel/pp.py): GPipe stage sharding over the
`stage` mesh axis, validated on the virtual 8-device CPU mesh.

The schedule (shard_map + lax.scan over ticks + neighbour ppermute) is
semantics-preserving — checks: (a) the pipelined forward equals the plain
TextClassifier forward exactly, microbatch by microbatch, (b) jax.grad
through the pipeline equals plain grads (the reverse schedule from the
autodiff transpose), (c) a train step learns while stage weights stay
sharded 1/S per stage row, (d) split/merge round-trips, (e) divisibility
guards."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from mpmc_tpu.config import ModelConfig, PoolingType, TextEncoderConfig
from mpmc_tpu.models.classifier import TextClassifier
from mpmc_tpu.parallel import pp

STAGES, MICRO = 4, 2


def _setup(pooling=PoolingType.CLS, num_layers=8, batch=8, seq=16, seed=0):
    tcfg = TextEncoderConfig(vocab_size=100, hidden_size=32,
                             num_layers=num_layers, num_heads=4,
                             intermediate_size=64,
                             max_position_embeddings=64)
    mcfg = ModelConfig(text=tcfg, pooling=pooling, num_classes=2)
    model = TextClassifier(mcfg)
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 100, (batch, seq)).astype(np.int32)
    # Ragged per-row mask so every microbatch sees a different mask — pins
    # the per-tick mask indexing inside the schedule.
    mask = np.ones_like(ids)
    for i in range(batch):
        mask[i, 8 + (i % 8):] = 0
    y = (rng.random(batch) > 0.5).astype(np.int32)
    variables = model.init(jax.random.key(0), ids[:1], mask[:1])
    return mcfg, model, variables["params"], ids, mask, y


def _mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("data", "stage"))


@pytest.mark.parametrize("pooling",
                         [PoolingType.CLS, PoolingType.ATTENTION])
@pytest.mark.slow  # heavy parity: covered by the per-round --runslow suite
def test_pp_forward_parity(pooling):
    mcfg, model, params, ids, mask, _ = _setup(pooling)
    ref = model.apply({"params": params}, ids, mask, train=False)
    mesh = _mesh()
    rest, stages = pp.split_stage_params(params, STAGES)
    rest, stages = pp.place_pp_params(rest, stages, mesh)
    fwd = pp.make_pp_forward(mcfg, mesh, STAGES, MICRO)
    out = jax.jit(fwd)(rest, stages, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pp_grad_parity():
    mcfg, model, params, ids, mask, y = _setup()
    mesh = _mesh()
    rest, stages = pp.split_stage_params(params, STAGES)
    rest, stages = pp.place_pp_params(rest, stages, mesh)
    fwd = pp.make_pp_forward(mcfg, mesh, STAGES, MICRO)

    def loss_pp(rest, stages):
        logits = fwd(rest, stages, ids, mask)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    def loss_plain(params):
        logits = model.apply({"params": params}, ids, mask, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    g_rest, g_stages = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(
        rest, stages)
    g_plain = jax.jit(jax.grad(loss_plain))(params)
    g_merged = pp.merge_stage_params(jax.device_get(g_rest),
                                     jax.device_get(g_stages))
    flat_a = jax.tree_util.tree_leaves_with_path(g_merged)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(g_plain))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_pp_train_step_learns_and_keeps_sharding():
    mcfg, model, params, ids, mask, y = _setup()
    mesh = _mesh()
    rest, stages = pp.split_stage_params(params, STAGES)
    rest, stages = pp.place_pp_params(rest, stages, mesh)
    fwd = pp.make_pp_forward(mcfg, mesh, STAGES, MICRO)
    tx = optax.adam(1e-2)
    pp_params = {"rest": rest, "stages": stages}
    # Eager init: mu/nu inherit the stage sharding from the placed params.
    opt_state = tx.init(pp_params)
    mu_stage_leaves = jax.tree_util.tree_leaves(opt_state[0].mu["stages"])
    assert all(leaf.sharding.spec[0] == "stage"
               for leaf in mu_stage_leaves)
    step = pp.make_pp_train_step(fwd, tx)
    batch = {"text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
             "label": jnp.asarray(y)}
    losses = []
    for _ in range(8):
        pp_params, opt_state, loss = step(pp_params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    for leaf in jax.tree_util.tree_leaves(pp_params["stages"]):
        assert leaf.sharding.spec[0] == "stage"


def test_pp_split_merge_roundtrip():
    _, _, params, _, _, _ = _setup()
    rest, stages = pp.split_stage_params(params, STAGES)
    leaves = jax.tree_util.tree_leaves(stages)
    assert all(leaf.shape[:2] == (STAGES, 8 // STAGES) for leaf in leaves)
    assert not any(k.startswith("layer_") for k in rest["encoder"])
    merged = pp.merge_stage_params(rest, stages)
    flat_a = jax.tree_util.tree_leaves_with_path(merged)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]))


def test_pp_divisibility_guards():
    mcfg, _, params, ids, mask, _ = _setup(num_layers=6)
    with pytest.raises(ValueError, match="not divisible"):
        pp.split_stage_params(params, 4)
    mcfg8, _, params8, ids, mask, _ = _setup()
    mesh = _mesh()
    rest, stages = pp.split_stage_params(params8, STAGES)
    fwd = pp.make_pp_forward(mcfg8, mesh, STAGES, num_microbatches=3)
    with pytest.raises(ValueError, match="not divisible"):
        fwd(rest, stages, ids, mask)  # batch 8 % 3 != 0
