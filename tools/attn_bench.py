import sys; sys.path.insert(0, "/root/repo")
import time, functools
import jax, jax.numpy as jnp, numpy as np
from mpmc_tpu.ops.attention import dot_product_attention

B, S, H, D = 16, 512, 12, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
mask = jnp.ones((B, S), jnp.float32)
N = 100

def serialized(impl):
    @jax.jit
    def many(q, k, v):
        def body(qq, _):
            o = dot_product_attention(qq, k, v, mask, impl=impl)
            return o, ()  # output feeds next iteration's q — serialized
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return many

def serialized_grad(impl):
    def loss(q, k, v):
        @jax.checkpoint
        def body(qq, _):
            o = dot_product_attention(qq, k, v, mask, impl=impl)
            return o, ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out.astype(jnp.float32).sum()
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

for impl in ("pallas", "xla"):
    f = serialized(impl)
    o = f(q, k, v); jax.block_until_ready(o)
    t0 = time.perf_counter(); o = f(q, k, v); jax.block_until_ready(o)
    fwd = (time.perf_counter() - t0) / N * 1e3
    g = serialized_grad(impl)
    o = g(q, k, v); jax.block_until_ready(o)
    t0 = time.perf_counter(); o = g(q, k, v); jax.block_until_ready(o)
    fb = (time.perf_counter() - t0) / N * 1e3
    print(f"{impl}: fwd {fwd:.3f} ms, fwd+bwd {fb:.3f} ms (per call)")
flops_fwd = 2*2*B*H*S*S*D
print("fwd roofline @197T full:", round(flops_fwd/197e12*1e3, 3), "ms; bwd ~2.5x")
