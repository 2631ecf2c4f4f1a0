"""Sequence/context parallelism (parallel/sp.py + the ring/ulysses attention
impls in ops/attention.py), validated on the virtual 8-device CPU mesh.

Checks: (a) ring attention under shard_map equals the exact XLA attention —
forward and grads — on sequence-sharded blocks with a ragged key-padding
mask; (b) same for the Ulysses all_to_all impl; (c) the SP text-classifier
forward equals the plain TextClassifier forward for both impls; (d) grads
through the SP stack match plain grads (the autodiff transpose of
ppermute/all_to_all); (e) a train step learns with params replicated and the
batch data/seq-sharded; (f) divisibility guards."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpmc_tpu.config import ModelConfig, PoolingType, TextEncoderConfig
from mpmc_tpu.models.classifier import TextClassifier
from mpmc_tpu.ops.attention import dot_product_attention
from mpmc_tpu.parallel import sp

SEQ_SHARDS = 4


def _seq_mesh(data=2, seq=SEQ_SHARDS):
    return Mesh(np.array(jax.devices()[:data * seq]).reshape(data, seq),
                ("data", "seq"))


def _qkvm(rng, B=4, S=16, H=4, D=8):
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    mask = np.ones((B, S), np.float32)
    for i in range(B):  # ragged: pin per-block mask routing
        mask[i, S - 3 - i:] = 0.0
    return q, k, v, mask


def _sp_attention(mesh, impl):
    """shard_map'd local-block attention: full arrays in, full arrays out."""
    fn = functools.partial(dot_product_attention, impl=f"{impl}:seq")
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"),
                  P(None, "seq")),
        out_specs=P(None, "seq"))


@pytest.mark.parametrize("impl", ["ring", "ulysses"])
def test_sp_attention_forward_parity(impl, rng):
    q, k, v, mask = _qkvm(rng)
    ref = dot_product_attention(q, k, v, mask, impl="xla")
    mesh = _seq_mesh()  # 4-way seq axis (ulysses needs H=4 % P == 0)
    out = jax.jit(_sp_attention(mesh, impl))(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("impl", ["ring", "ulysses"])
def test_sp_attention_grad_parity(impl, rng):
    q, k, v, mask = _qkvm(rng)
    mesh = _seq_mesh()
    sp_attn = _sp_attention(mesh, impl)
    # Weight the output so the cotangent is not uniform across positions.
    w = rng.standard_normal(q.shape).astype(np.float32)

    def loss(attn_fn, q, k, v):
        return jnp.sum(attn_fn(q, k, v, mask) * w)

    g_sp = jax.jit(jax.grad(functools.partial(loss, sp_attn),
                            argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(
        functools.partial(loss, functools.partial(dot_product_attention,
                                                  impl="xla")),
        argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(g_sp, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=f"d{name}")


def _setup(num_layers=2, batch=4, seq=16, pooling=PoolingType.ATTENTION):
    tcfg = TextEncoderConfig(vocab_size=100, hidden_size=32,
                             num_layers=num_layers, num_heads=4,
                             intermediate_size=64,
                             max_position_embeddings=64)
    mcfg = ModelConfig(text=tcfg, pooling=pooling, num_classes=2)
    model = TextClassifier(mcfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, (batch, seq)).astype(np.int32)
    mask = np.ones_like(ids)
    for i in range(batch):
        mask[i, 10 + (i % 6):] = 0
    y = (rng.random(batch) > 0.5).astype(np.int32)
    params = model.init(jax.random.key(0), ids[:1], mask[:1])["params"]
    return mcfg, model, params, ids, mask, y


@pytest.mark.parametrize("impl", ["ring", "ulysses"])
def test_sp_forward_parity(impl):
    mcfg, model, params, ids, mask, _ = _setup()
    ref = model.apply({"params": params}, ids, mask, train=False)
    mesh = _seq_mesh()
    fwd = sp.make_sp_forward(mcfg, mesh, impl=impl)
    out = jax.jit(fwd)(sp.place_sp_params(params, mesh), ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sp_grad_parity():
    mcfg, model, params, ids, mask, y = _setup()
    mesh = _seq_mesh()
    fwd = sp.make_sp_forward(mcfg, mesh, impl="ring")

    def loss_sp(params):
        logits = fwd(params, ids, mask)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    def loss_plain(params):
        logits = model.apply({"params": params}, ids, mask, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    g_sp = jax.jit(jax.grad(loss_sp))(sp.place_sp_params(params, mesh))
    g_plain = jax.jit(jax.grad(loss_plain))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(g_sp))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(g_plain))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_sp_train_step_learns():
    mcfg, _, params, ids, mask, y = _setup()
    mesh = _seq_mesh()
    fwd = sp.make_sp_forward(mcfg, mesh, impl="ring")
    tx = optax.adam(1e-2)
    params = sp.place_sp_params(params, mesh)
    opt_state = tx.init(params)
    step = sp.make_sp_train_step(fwd, tx)
    batch = jax.device_put(
        {"text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
         "label": jnp.asarray(y)}, NamedSharding(mesh, P("data")))
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sp_guards():
    mcfg, _, params, ids, mask, _ = _setup(seq=18)  # 18 % 4 != 0
    mesh = _seq_mesh()
    fwd = sp.make_sp_forward(mcfg, mesh, impl="ring")
    with pytest.raises(ValueError, match="not divisible"):
        fwd(sp.place_sp_params(params, mesh), ids, mask)
    with pytest.raises(ValueError, match="unknown SP impl"):
        sp.make_sp_forward(mcfg, mesh, impl="nope")
    # Ulysses requires heads % seq-shards == 0: 4 heads on an 8-way axis.
    q = np.zeros((2, 16, 4, 8), np.float32)
    mesh8 = _seq_mesh(data=1, seq=8)
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(_sp_attention(mesh8, "ulysses"))(
            q, q, q, np.ones((2, 16), np.float32))
