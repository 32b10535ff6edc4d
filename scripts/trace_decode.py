"""Capture a jax.profiler trace of the decode chunk for op-level analysis."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from chatterbox_vllm2_tpu.config import T3Config
from chatterbox_vllm2_tpu.models.t3.model import (
    KVCache, build_decode_embeds, decode_attn_mask, init_t3_params,
    make_rope_tables, t3_backbone)

B, MAX_LEN, STEPS = 8, 384, 8
S = 2 * B
t3 = T3Config.multilingual()
params = init_t3_params(jax.random.PRNGKey(0), t3, jnp.bfloat16)
cos, sin = make_rope_tables(t3, MAX_LEN)


def backbone_scan(params, kv, lengths, n):
    def step(carry, _):
        kv, lengths = carry
        embeds = build_decode_embeds(params, t3, jnp.zeros((S,), jnp.int32),
                                     jnp.ones((S,), jnp.int32), jnp.bfloat16)
        mask = decode_attn_mask(lengths, MAX_LEN)
        h, kv = t3_backbone(params, t3, embeds,
                            lengths[:, None].astype(jnp.int32), kv, lengths,
                            mask, cos, sin)
        return (kv, lengths + 1), h[0, 0, 0]
    (kv, lengths), hs = jax.lax.scan(step, (kv, lengths), None, length=n)
    return kv, hs


bs_jit = jax.jit(backbone_scan, static_argnames=("n",), donate_argnums=(1,))
kv = KVCache.zeros(t3, S, MAX_LEN, jnp.bfloat16)
lengths = jnp.full((S,), 100, jnp.int32)
kv, hs = bs_jit(params, kv, lengths, STEPS)
jax.block_until_ready(hs)

with jax.profiler.trace("/tmp/t3trace"):
    kv, hs = bs_jit(params, kv, lengths, STEPS)
    jax.block_until_ready(hs)
print("trace done")
