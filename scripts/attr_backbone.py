"""Attribute decode-backbone time: which piece of the 30-layer step costs.

Timing methodology: chained executions (donated carry), one device_get at the
end — per-call block_until_ready on donated outputs lies through the axon
tunnel.   python scripts/attr_backbone.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_vllm2_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_vllm2_tpu.config import T3Config
from chatterbox_vllm2_tpu.models.t3.model import (
    KVCache, init_t3_params, make_rope_tables,
)
from chatterbox_vllm2_tpu.ops.norm import rms_norm
from chatterbox_vllm2_tpu.ops.quant_matmul import quant_einsum, quantize_t3_params
from chatterbox_vllm2_tpu.ops.rotary import apply_rope

t3 = T3Config.multilingual()
MAX_LEN = 384
STEPS = 256


def build(B, cache_len, kv_write, attn, mlp, layer_mode="scan",
          write_mode="scatter"):
    S = 2 * B
    cos, sin = make_rope_tables(t3, 1024)
    nh, hd = t3.num_heads, t3.head_dim
    sc = hd ** -0.5

    def qkv(lp, y):
        out = quant_einsum(y, lp["qkv_proj"])
        out = out.reshape(y.shape[:-1] + (nh, 3, hd))
        return out[..., 0, :], out[..., 1, :], out[..., 2, :]

    def layer_body(x, kc, vc, lp, l, lengths, mask, rows):
        pos = lengths[:, None]
        y = rms_norm(x, lp["input_norm"], t3.rms_norm_eps)
        q, k, v = qkv(lp, y)
        q = apply_rope(q[:, None], cos, sin, pos)[:, 0]
        k = apply_rope(k[:, None], cos, sin, pos)[:, 0]
        if kv_write:
            if write_mode == "scatter":
                kc = kc.at[l, rows, :, lengths, :].set(k.astype(kc.dtype))
                vc = vc.at[l, rows, :, lengths, :].set(v.astype(vc.dtype))
            else:  # "dus": single column write at a scalar position
                wp = lengths[0]
                kc = jax.lax.dynamic_update_slice(
                    kc, k.astype(kc.dtype)[None, :, :, None, :], (l, 0, 0, wp, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, v.astype(vc.dtype)[None, :, :, None, :], (l, 0, 0, wp, 0))
        if attn:
            kk = jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False)[:, :, :cache_len, :]
            vv = jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False)[:, :, :cache_len, :]
            scores = jnp.einsum("shd,shmd->shm", q, kk,
                                preferred_element_type=jnp.float32) * sc
            scores = jnp.where(mask[:, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("shm,shmd->shd", probs.astype(vv.dtype), vv,
                             preferred_element_type=jnp.float32).astype(x.dtype)
            x = x + quant_einsum(out.reshape(S, nh * hd), lp["o_proj"])
        else:
            x = x + q.reshape(S, nh * hd).astype(x.dtype) * jnp.float32(0.01).astype(x.dtype)
        if mlp:
            y = rms_norm(x, lp["post_norm"], t3.rms_norm_eps)
            gu = quant_einsum(y, lp["gate_up_proj"])
            gu = gu.reshape(y.shape[:-1] + (gu.shape[-1] // 2, 2))
            act = jax.nn.silu(gu[..., 0]) * gu[..., 1]
            x = x + quant_einsum(act, lp["down_proj"])
        return x, kc, vc

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def chunk(params, kc, vc, lengths, x0):
        def step(carry, _):
            kc, vc, lengths, x = carry
            rows = jnp.arange(S)
            mask = jnp.arange(cache_len)[None, :] <= lengths[:, None]
            if layer_mode == "scan":
                def body(c, inp):
                    x, kc, vc = c
                    lp, l = inp
                    x, kc, vc = layer_body(x, kc, vc, lp, l, lengths, mask, rows)
                    return (x, kc, vc), None
                (x, kc, vc), _ = jax.lax.scan(
                    body, (x, kc, vc),
                    (params["layers"], jnp.arange(t3.num_layers)))
            else:
                for l in range(t3.num_layers):
                    lp = jax.tree.map(lambda a: a[l], params["layers"])
                    x, kc, vc = layer_body(x, kc, vc, lp, l, lengths, mask, rows)
            x = rms_norm(x, params["final_norm"], t3.rms_norm_eps)
            return (kc, vc, lengths + 1, x), None

        carry, _ = jax.lax.scan(step, (kc, vc, lengths, x0), None, length=STEPS)
        return carry
    return chunk


def run(label, params, B=8, cache_len=MAX_LEN, kv_write=True, attn=True,
        mlp=True, layer_mode="scan", write_mode="scatter"):
    S = 2 * B
    chunk = build(B, cache_len, kv_write, attn, mlp, layer_mode, write_mode)

    def fresh():
        kv = KVCache.zeros(t3, S, MAX_LEN, jnp.bfloat16)
        x0 = jnp.asarray(np.random.RandomState(0).randn(S, t3.hidden_size),
                         jnp.bfloat16)
        return kv.k, kv.v, jnp.full((S,), 75, jnp.int32), x0

    st = fresh()
    st = chunk(params, *st)
    jax.block_until_ready(st)
    st = fresh()
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    st = chunk(params, *st)
    _ = float(jax.device_get(st[3][0, 0]))
    dt = time.perf_counter() - t0
    print(f"  {dt / STEPS * 1000:7.3f} ms/step  {label}", flush=True)


def main():
    params_bf16 = init_t3_params(0, t3, jnp.bfloat16)
    params_int8 = quantize_t3_params(params_bf16, "int8")
    print(f"steps={STEPS} (chained scan, one final get)")
    run("int8 B=8 full backbone (baseline)", params_int8)
    run("int8 B=8 no kv write", params_int8, kv_write=False)
    run("int8 B=8 no attention (writes kept)", params_int8, attn=False)
    run("int8 B=8 no mlp", params_int8, mlp=False)
    run("int8 B=8 cache_len=128", params_int8, cache_len=128)
    run("int8 B=8 dus column write", params_int8, write_mode="dus")
    run("int8 B=16 full", params_int8, B=16)
    run("int8 B=1 full", params_int8, B=1)
    run("bf16 B=8 full", params_bf16)
    run("int8 B=8 unroll", params_int8, layer_mode="unroll")


if __name__ == "__main__":
    main()
