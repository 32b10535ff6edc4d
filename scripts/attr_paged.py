"""Attribute paged-decode time: append scatters vs the Pallas kernel vs the
dense qkv/mlp floor.  Chained executions (donated pools), one device_get at
the end — per-call block_until_ready lies through the axon tunnel.

    python scripts/attr_paged.py [--pairs 16] [--block 128] [--steps 64]
"""

import argparse
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
    _layer_params, _mlp, _qkv, init_t3_params, make_rope_tables,
)
from chatterbox_vllm2_tpu.ops.norm import rms_norm
from chatterbox_vllm2_tpu.ops.paged_attention import (
    append_layer_to_pages, pack_pairs, paged_attention_pairs, unpack_pairs,
)
from chatterbox_vllm2_tpu.ops.quant_matmul import quant_einsum, quantize_t3_params
from chatterbox_vllm2_tpu.ops.rotary import apply_rope

t3 = T3Config.multilingual()


def build(B, bs, NB, P, quantized, *, append=True, attn=True, steps=64):
    S = 2 * B
    cos, sin = make_rope_tables(t3, 1024)
    nh, hd = t3.num_heads, t3.head_dim

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
    def chunk(params, kp, vp, ks, vs, tables, lengths, x0):
        def step(carry, _):
            kp, vp, ks, vs, lengths, x = carry
            pos = jnp.repeat(lengths, 2)[:, None]
            for l in range(t3.num_layers):
                lp = _layer_params(params, l)
                resid = x
                y = rms_norm(x, lp["input_norm"], t3.rms_norm_eps)
                q, k, v = _qkv(lp, y, t3)
                q = apply_rope(q[:, None], cos, sin, pos)[:, 0]
                k = apply_rope(k[:, None], cos, sin, pos)[:, 0]
                if append:
                    kp, vp, ks, vs = append_layer_to_pages(
                        kp, vp, k, v, l, tables, lengths, block_size=bs,
                        k_scales=ks, v_scales=vs)
                if attn:
                    out = paged_attention_pairs(
                        pack_pairs(q), kp, vp, tables, lengths + 1, l,
                        block_size=bs, sm_scale=hd ** -0.5,
                        k_scales=ks, v_scales=vs, interpret=False)
                    out = unpack_pairs(out).reshape(S, nh * hd)
                else:
                    out = q.reshape(S, nh * hd) * 0.01
                x = resid + quant_einsum(out.astype(x.dtype), lp["o_proj"])
                resid = x
                y = rms_norm(x, lp["post_norm"], t3.rms_norm_eps)
                x = resid + _mlp(lp, y)
            return (kp, vp, ks, vs, lengths + 1, x), None

        carry, _ = jax.lax.scan(step, (kp, vp, ks, vs, lengths, x0), None,
                                length=steps)
        return carry
    return chunk


def run(label, params, *, B, bs, max_len, quantized, append=True, attn=True,
        steps=64, start_len=80):
    S = 2 * B
    NB = -(-max_len // bs)
    P = B * NB
    H, D2 = t3.num_kv_heads, 2 * t3.head_dim
    L = t3.num_layers
    chunk = build(B, bs, NB, P, quantized, append=append, attn=attn,
                  steps=steps)
    kv_dtype = jnp.int8 if quantized else jnp.bfloat16
    tables = jnp.asarray(np.arange(P, dtype=np.int32).reshape(B, NB))

    def fresh():
        kp = jnp.zeros((L, P, H, bs, D2), kv_dtype)
        vp = jnp.zeros((L, P, H, bs, D2), kv_dtype)
        ks = jnp.zeros((L, P, H, bs), jnp.float32) if quantized else None
        vs = jnp.zeros((L, P, H, bs), jnp.float32) if quantized else None
        x0 = jnp.asarray(np.random.RandomState(0).randn(S, t3.hidden_size),
                         jnp.bfloat16)
        return kp, vp, ks, vs, jnp.full((B,), start_len, jnp.int32), x0

    st = fresh()
    st = chunk(params, st[0], st[1], st[2], st[3], tables, st[4], st[5])
    jax.block_until_ready(st)
    st = fresh()
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    st = chunk(params, st[0], st[1], st[2], st[3], tables, st[4], st[5])
    _ = float(jax.device_get(st[5][0, 0]))
    dt = time.perf_counter() - t0
    print(f"  {dt / steps * 1000:7.3f} ms/step  {label}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--max-len", type=int, default=384)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()
    B, bs, ml, steps = args.pairs, args.block, args.max_len, args.steps

    params = quantize_t3_params(init_t3_params(0, t3, jnp.bfloat16), "int8")
    print(f"pairs={B} block={bs} max_len={ml} steps={steps} "
          f"(chained scan, one final get)")
    run("qkv+mlp only (floor: no append, no attn)", params, B=B, bs=bs,
        max_len=ml, quantized=False, append=False, attn=False, steps=steps)
    run("+ append scatter, no attn (bf16)", params, B=B, bs=bs, max_len=ml,
        quantized=False, attn=False, steps=steps)
    run("+ append scatter, no attn (int8)", params, B=B, bs=bs, max_len=ml,
        quantized=True, attn=False, steps=steps)
    run("full (bf16 pages)", params, B=B, bs=bs, max_len=ml, quantized=False,
        steps=steps)
    run("full (int8 pages)", params, B=B, bs=bs, max_len=ml, quantized=True,
        steps=steps)
    run("full (bf16 pages, block 64)", params, B=B, bs=64, max_len=ml,
        quantized=False, steps=steps)


if __name__ == "__main__":
    main()
