"""Benchmark weight-matmul variants at T3 decode shapes on the TPU.

Per decode step the backbone does, per layer: [S,1024]x[1024,3072] (qkv),
[S,1024]x[1024,1024] (o), [S,1024]x[1024,8192] (gate_up), [S,4096]x[4096,1024]
(down); plus one [S,1024]x[1024,8448] lm head.  S = 16.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_vllm2_tpu.ops.quant_matmul import quantize, quant_matmul

S, H, INTER, L = 16, 1024, 4096, 30
SHAPES = [(H, 3 * H), (H, H), (H, 2 * INTER), (INTER, H)]
N_ITER = 32


def timeit(fn, *args):
    out = fn(*args)
    _ = jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = jax.device_get(jax.tree.leaves(out)[0])
    return time.perf_counter() - t0


key = jax.random.PRNGKey(0)
x16 = jax.random.normal(key, (S, H), jnp.bfloat16)
x4k = jax.random.normal(key, (S, INTER), jnp.bfloat16)

# --- bf16 stacked (layers as leading dim, scan over steps to amortize) -------
Ws = {i: jax.random.normal(key, (L,) + shp, jnp.bfloat16) * 0.02
      for i, shp in enumerate(SHAPES)}

def bf16_stack(ws, x0):
    def step(x, _):
        acc = jnp.zeros((S,), jnp.float32)
        for l in range(L):
            y = jnp.einsum("sh,hd->sd", x, ws[0][l])[:, :H]
            y = jnp.einsum("sh,hd->sd", y, ws[1][l])
            z = jnp.einsum("sh,hd->sd", y, ws[2][l])[:, :INTER]
            y = jnp.einsum("si,ih->sh", z, ws[3][l])
            x = x + y * 1e-3
            acc = acc + y[:, 0]
        return x, acc[0]
    x, accs = jax.lax.scan(step, x0, None, length=N_ITER)
    return accs

t = timeit(jax.jit(bf16_stack), Ws, x16) / N_ITER
gb = sum(np.prod(s) for s in SHAPES) * L * 2 / 1e9
print(f"bf16 einsum : {t*1e3:.3f} ms/step  {gb:.2f} GB -> {gb/t:.0f} GB/s")

# --- int8 native MXU: int8 weights, int8-quantized activations ---------------
W8 = {i: (jax.random.normal(key, (L,) + shp, jnp.float32) * 30).astype(jnp.int8)
      for i, shp in enumerate(SHAPES)}
WS = {i: jnp.full((L, shp[1]), 1e-3, jnp.float32) for i, shp in enumerate(SHAPES)}

def q_act(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return xq, scale

def mm8(x, w8, ws):
    xq, xs = q_act(x)
    y = jax.lax.dot_general(xq, w8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * xs * ws[None, :]).astype(jnp.bfloat16)

def int8_stack(w8, ws, x0):
    def step(x, _):
        acc = jnp.zeros((S,), jnp.float32)
        for l in range(L):
            y = mm8(x, w8[0][l], ws[0][l])[:, :H]
            y = mm8(y, w8[1][l], ws[1][l])
            z = mm8(y, w8[2][l], ws[2][l])[:, :INTER]
            y = mm8(z, w8[3][l], ws[3][l])
            x = x + y * 1e-3
            acc = acc + y[:, 0].astype(jnp.float32)
        return x, acc[0]
    x, accs = jax.lax.scan(step, x0, None, length=N_ITER)
    return accs

t = timeit(jax.jit(int8_stack), W8, WS, x16) / N_ITER
gb8 = gb / 2
print(f"int8 MXU    : {t*1e3:.3f} ms/step  {gb8:.2f} GB -> {gb8/t:.0f} GB/s")

# --- Pallas int4 / int8 qmm ---------------------------------------------------
for bits in (4, 8):
    qs = {i: quantize(np.random.randn(*shp).astype(np.float32) * 0.02, bits=bits)
          for i, shp in enumerate(SHAPES)}
    packed = {i: jnp.stack([qs[i].packed] * L) for i in qs}
    scales = {i: jnp.stack([qs[i].scales] * L) for i in qs}
    zeros = {i: jnp.stack([qs[i].zeros] * L) for i in qs}

    def qmm_stack(packed, scales, zeros, x0, bits=bits):
        from chatterbox_vllm2_tpu.ops.quant_matmul import QuantLinear
        def step(x, _):
            acc = jnp.zeros((S,), jnp.float32)
            for l in range(L):
                def q(i):
                    return QuantLinear(packed[i][l], scales[i][l], zeros[i][l],
                                       bits, 128)
                y = quant_matmul(x, q(0))[:, :H]
                y = quant_matmul(y, q(1))
                z = quant_matmul(y, q(2))[:, :INTER]
                y = quant_matmul(z, q(3))
                x = x + y * 1e-3
                acc = acc + y[:, 0].astype(jnp.float32)
            return x, acc[0]
        x, accs = jax.lax.scan(step, x0, None, length=N_ITER)
        return accs

    try:
        t = timeit(jax.jit(qmm_stack), packed, scales, zeros, x16) / N_ITER
        gbq = gb / 2 / (8 // bits)
        print(f"pallas int{bits}: {t*1e3:.3f} ms/step  {gbq:.2f} GB -> {gbq/t:.0f} GB/s")
    except Exception as e:
        print(f"pallas int{bits}: FAILED {type(e).__name__}: {str(e)[:200]}")
