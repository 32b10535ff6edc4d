"""Does splitting the KV cache into per-layer arrays (unrolled loop, reads
at full cache_len so attention operands are whole arrays, not slices) beat
the scan-over-stacked-cache design?   python scripts/attr_perlayer.py"""

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
B = 8
S = 2 * B
L = t3.num_layers


def layer_step(lp, x, kk, vv, lengths, mask, cos, sin):
    """One layer: returns (x, k_new [S,H,D], v_new [S,H,D])."""
    nh, hd = t3.num_heads, t3.head_dim
    pos = lengths[:, None]
    y = rms_norm(x, lp["input_norm"], t3.rms_norm_eps)
    out = quant_einsum(y, lp["qkv_proj"]).reshape(S, nh, 3, hd)
    q, k, v = out[:, :, 0], out[:, :, 1], out[:, :, 2]
    q = apply_rope(q[:, None], cos, sin, pos)[:, 0]
    k = apply_rope(k[:, None], cos, sin, pos)[:, 0]
    scores = jnp.einsum("shd,shmd->shm", q, kk,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    scores = jnp.where(mask[:, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    att = jnp.einsum("shm,shmd->shd", probs.astype(vv.dtype), vv,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + quant_einsum(att.reshape(S, nh * hd), lp["o_proj"])
    y = rms_norm(x, lp["post_norm"], t3.rms_norm_eps)
    gu = quant_einsum(y, lp["gate_up_proj"])
    gu = gu.reshape(S, gu.shape[-1] // 2, 2)
    act = jax.nn.silu(gu[..., 0]) * gu[..., 1]
    x = x + quant_einsum(act, lp["down_proj"])
    return x, k, v


def main():
    params = quantize_t3_params(init_t3_params(0, t3, jnp.bfloat16), "int8")
    cos, sin = make_rope_tables(t3, 1024)
    rows = jnp.arange(S)

    # ---- variant A: per-layer separate caches, unrolled, full reads ------
    n_kv = 2 * L

    def chunk_perlayer_impl(params, lengths, x0, *caches):
        ks, vs = list(caches[:L]), list(caches[L:])

        def step(carry, _):
            lengths, x, ks, vs = carry[0], carry[1], list(carry[2]), list(carry[3])
            mask = jnp.arange(MAX_LEN)[None, :] <= lengths[:, None]
            for l in range(L):
                lp = jax.tree.map(lambda a: a[l], params["layers"])
                x, k, v = layer_step(lp, x, ks[l], vs[l], lengths, mask,
                                     cos, sin)
                ks[l] = ks[l].at[rows, :, lengths, :].set(k.astype(ks[l].dtype))
                vs[l] = vs[l].at[rows, :, lengths, :].set(v.astype(vs[l].dtype))
            x = rms_norm(x, params["final_norm"], t3.rms_norm_eps)
            x = x / (1.0 + 1e-6 * jnp.mean(x))
            return (lengths + 1, x, tuple(ks), tuple(vs)), None

        carry, _ = jax.lax.scan(
            step, (lengths, x0, tuple(ks), tuple(vs)), None, length=STEPS)
        return carry

    chunk_perlayer = jax.jit(
        chunk_perlayer_impl, donate_argnums=tuple(range(3, 3 + n_kv)))

    def fresh_perlayer():
        ks = [jnp.zeros((S, t3.num_kv_heads, MAX_LEN, t3.head_dim),
                        jnp.bfloat16) for _ in range(L)]
        vs = [jnp.zeros_like(k) for k in ks]
        x0 = jnp.asarray(np.random.RandomState(0).randn(S, t3.hidden_size),
                         jnp.bfloat16)
        return ks, vs, x0

    ks, vs, x0 = fresh_perlayer()
    lengths = jnp.full((S,), 75, jnp.int32)
    out = chunk_perlayer(params, lengths, x0, *ks, *vs)
    _ = float(jax.device_get(out[1][0, 0]))
    ks, vs, x0 = fresh_perlayer()
    t0 = time.perf_counter()
    out = chunk_perlayer(params, lengths, x0, *ks, *vs)
    _ = float(jax.device_get(out[1][0, 0]))
    dt = time.perf_counter() - t0
    print(f"per-layer caches, unrolled, full reads: {dt/STEPS*1000:.3f} ms/step")

    # ---- variant B: stacked cache + scan (current design) for same-day ref
    from chatterbox_vllm2_tpu.models.t3.model import t3_decode, build_decode_embeds

    @functools.partial(jax.jit, donate_argnums=(1,))
    def chunk_stacked(params, kv, lengths, x0):
        def step(carry, _):
            kv, lengths, x = carry
            hidden, kv = t3_decode(params, t3, x, kv, lengths, cos, sin,
                                   cache_len=MAX_LEN, layer_mode="scan")
            hidden = hidden / (1.0 + 1e-6 * jnp.mean(hidden))
            return (kv, lengths + 1, hidden.astype(x.dtype)), None
        carry, _ = jax.lax.scan(step, (kv, lengths, x0), None, length=STEPS)
        return carry

    kv = KVCache.zeros(t3, S, MAX_LEN, jnp.bfloat16)
    x0 = jnp.asarray(np.random.RandomState(0).randn(S, t3.hidden_size),
                     jnp.bfloat16)
    out = chunk_stacked(params, kv, lengths, x0)
    _ = float(jax.device_get(out[2][0, 0]))
    kv = KVCache.zeros(t3, S, MAX_LEN, jnp.bfloat16)
    t0 = time.perf_counter()
    out = chunk_stacked(params, kv, lengths, x0)
    _ = float(jax.device_get(out[2][0, 0]))
    dt = time.perf_counter() - t0
    print(f"stacked cache + scan (current):        {dt/STEPS*1000:.3f} ms/step")


if __name__ == "__main__":
    main()
