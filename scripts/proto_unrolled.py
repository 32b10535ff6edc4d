"""Prototype: unrolled-layer decode step with in-place stacked KV cache.

Validates the round-2 redesign before it lands in models/t3/model.py:
  * Python-unrolled 30 layers (no lax.scan over layers -> no xs/ys cache copy)
  * fused QKV and gate+up weights
  * in-place scatter append (donated cache, static layer index)
  * attention over a static cache-length bucket (cache_len <= max_len)
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, MAX_LEN, STEPS = 8, 384, 8
S = 2 * B
L, H, D, NH, INTER = 30, 1024, 64, 16, 4096
CACHE_LEN = 256   # static bucket

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
params = {
    "qkv": jax.random.normal(ks[0], (L, H, 3 * NH * D), jnp.bfloat16) * 0.02,
    "o": jax.random.normal(ks[1], (L, NH * D, H), jnp.bfloat16) * 0.02,
    "gate_up": jax.random.normal(ks[2], (L, H, 2 * INTER), jnp.bfloat16) * 0.02,
    "down": jax.random.normal(ks[3], (L, INTER, H), jnp.bfloat16) * 0.02,
    "in_norm": jnp.ones((L, H), jnp.bfloat16),
    "post_norm": jnp.ones((L, H), jnp.bfloat16),
    "head": jax.random.normal(ks[4], (H, 8448), jnp.bfloat16) * 0.02,
}


def rms(x, w):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype) * w


def step_fn(params, kcache, vcache, x, lengths):
    # x: [S, H]; kcache/vcache: [L, S, MAX_LEN, NH, D]
    rows = jnp.arange(S)
    mask = (jnp.arange(CACHE_LEN)[None, :] <= lengths[:, None])  # [S, CL]
    for l in range(L):
        resid = x
        y = rms(x, params["in_norm"][l])
        qkv = jnp.einsum("sh,hd->sd", y, params["qkv"][l])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(S, NH, D)
        k = k.reshape(S, NH, D)
        v = v.reshape(S, NH, D)
        kcache = kcache.at[l, rows, lengths].set(k)
        vcache = vcache.at[l, rows, lengths].set(v)
        kk = kcache[l, :, :CACHE_LEN]          # [S, CL, NH, D]
        vv = vcache[l, :, :CACHE_LEN]
        scores = jnp.einsum("shd,smhd->shm", q, kk,
                            preferred_element_type=jnp.float32) * (D ** -0.5)
        scores = jnp.where(mask[:, None, :], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("shm,smhd->shd", p.astype(vv.dtype), vv,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        x = resid + jnp.einsum("sd,dh->sh", out.reshape(S, NH * D), params["o"][l])
        resid = x
        y = rms(x, params["post_norm"][l])
        gu = jnp.einsum("sh,hi->si", y, params["gate_up"][l])
        g, u = jnp.split(gu, 2, axis=-1)
        x = resid + jnp.einsum("si,ih->sh", jax.nn.silu(g) * u, params["down"][l])
    logits = jnp.einsum("sh,hv->sv", rms(x, jnp.ones((H,), jnp.bfloat16)),
                        params["head"], preferred_element_type=jnp.float32)
    return kcache, vcache, logits


def chunk(params, kcache, vcache, lengths, n):
    def body(carry, _):
        kcache, vcache, lengths = carry
        x = jnp.zeros((S, H), jnp.bfloat16)
        kcache, vcache, logits = step_fn(params, kcache, vcache, x, lengths)
        return (kcache, vcache, lengths + 1), logits[0, 0]
    (kcache, vcache, lengths), ls = jax.lax.scan(
        body, (kcache, vcache, lengths), None, length=n)
    return kcache, vcache, ls


jit_chunk = jax.jit(chunk, static_argnames=("n",), donate_argnums=(1, 2))

kc = jnp.zeros((L, S, MAX_LEN, NH, D), jnp.bfloat16)
vc = jnp.zeros((L, S, MAX_LEN, NH, D), jnp.bfloat16)
lengths = jnp.full((S,), 100, jnp.int32)
t0 = time.perf_counter()
kc, vc, ls = jit_chunk(params, kc, vc, lengths, STEPS)
jax.block_until_ready(ls)
print(f"compile+run: {time.perf_counter()-t0:.1f}s")
N = 64
t0 = time.perf_counter()
for _ in range(N // STEPS):
    kc, vc, ls = jit_chunk(params, kc, vc, lengths, STEPS)
jax.block_until_ready(ls)
dt = (time.perf_counter() - t0) / N
w_gb = (sum(np.prod(v.shape) for v in params.values())) * 2 / 1e9
kv_gb = 2 * L * S * CACHE_LEN * NH * D * 2 / 1e9
print(f"unrolled step: {dt*1e3:.3f} ms -> {1/dt:.0f} steps/s  "
      f"traffic ~{w_gb + kv_gb:.2f} GB -> {(w_gb + kv_gb)/dt:.0f} GB/s of 819")
