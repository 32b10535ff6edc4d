"""Prototype v2: unrolled layers + layout-native split K/V caches.

K cache [L, S, H, D, M]  (M minor -> natural stationary operand for QK^T)
V cache [L, S, H, M, D]  (D minor -> natural for PV)
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CACHE_LEN = int(sys.argv[3]) if len(sys.argv) > 3 else 256
MAX_LEN = 384
S = 2 * B
L, H, D, NH, INTER = 30, 1024, 64, 16, 4096

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
        # K: [L,S,H,D,M] append at [.., :, :, len]; V: [L,S,H,M,D] at [.., len, :]
        kcache = kcache.at[l, rows, :, :, lengths].set(k.transpose(0, 1, 2))
        vcache = vcache.at[l, rows, :, lengths, :].set(v)
        kk = kcache[l, :, :, :, :CACHE_LEN]          # [S, H, D, CL]
        vv = vcache[l, :, :, :CACHE_LEN, :]          # [S, H, CL, D]
        scores = jnp.einsum("shd,shdm->shm", q, kk,
                            preferred_element_type=jnp.float32) * (D ** -0.5)
        scores = jnp.where(mask[:, None, :], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("shm,shmd->shd", p.astype(vv.dtype), vv,
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

kc = jnp.zeros((L, S, NH, D, MAX_LEN), jnp.bfloat16)
vc = jnp.zeros((L, S, NH, MAX_LEN, D), jnp.bfloat16)
lengths = jnp.full((S,), 100, jnp.int32)
t0 = time.perf_counter()
kc, vc, ls = jit_chunk(params, kc, vc, lengths, STEPS)
jax.block_until_ready(ls)
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
for trial in range(3):
    t0 = time.perf_counter()
    kc, vc, ls = jit_chunk(params, kc, vc, lengths, STEPS)
    jax.block_until_ready(ls)
    dt = (time.perf_counter() - t0) / STEPS
    w_gb = (sum(int(np.prod(v.shape)) for v in params.values())) * 2 / 1e9
    kv_gb = 2 * L * S * CACHE_LEN * NH * D * 2 / 1e9
    print(f"B={B} steps={STEPS} CL={CACHE_LEN}: {dt*1e3:.3f} ms/step -> {1/dt:.0f} steps/s"
          f" ({B/dt:.0f} tok/s agg)  ~{(w_gb+kv_gb)/dt:.0f} GB/s of 819")
