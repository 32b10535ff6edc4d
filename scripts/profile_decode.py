"""Roofline probe: time the raw T3 decode chunk on the attached chip.

Breaks the decode step into pieces so we can see where time goes vs
speed-of-light (v5e: ~819 GB/s HBM, ~197 bf16 TFLOP/s).
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_vllm2_tpu.config import Config, EngineConfig, T3Config
from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
from chatterbox_vllm2_tpu.engine.engine import DecodeState
from chatterbox_vllm2_tpu.models.t3.model import KVCache, init_t3_params, make_rope_tables, t3_backbone, build_decode_embeds, decode_attn_mask
from chatterbox_vllm2_tpu.ops.sampling import SamplingState

B = int(os.environ.get("B", 8))
MAX_LEN = int(os.environ.get("MAX_LEN", 384))
STEPS = int(os.environ.get("STEPS", 8))
S = 2 * B

t3 = T3Config.multilingual()
cfg = Config(t3=t3, engine=EngineConfig(max_batch_size=B, max_model_len=MAX_LEN,
                                        prefill_buckets=(64,),
                                        decode_steps_per_dispatch=STEPS))
params = init_t3_params(jax.random.PRNGKey(0), t3, jnp.bfloat16)
eng = T3Engine(cfg, params)

# --- raw backbone step (no sampling/analyzer) --------------------------------
cos, sin = make_rope_tables(t3, MAX_LEN)

def backbone_only(params, kv, lengths):
    embeds = build_decode_embeds(params, t3, jnp.zeros((S,), jnp.int32),
                                 jnp.ones((S,), jnp.int32), jnp.bfloat16)
    mask = decode_attn_mask(lengths, MAX_LEN)
    hidden, kv = t3_backbone(params, t3, embeds, lengths[:, None].astype(jnp.int32),
                             kv, lengths, mask, cos, sin)
    return hidden, kv

def backbone_scan(params, kv, lengths, n):
    def step(carry, _):
        kv, lengths = carry
        h, kv = backbone_only(params, kv, lengths)
        return (kv, lengths + 1), h[0, 0, 0]
    (kv, lengths), hs = jax.lax.scan(step, (kv, lengths), None, length=n)
    return kv, hs

bs_jit = jax.jit(backbone_scan, static_argnames=("n",), donate_argnums=(1,))

kv = KVCache.zeros(t3, S, MAX_LEN, jnp.bfloat16)
lengths = jnp.full((S,), 100, jnp.int32)
kv, hs = bs_jit(params, kv, lengths, STEPS)
jax.block_until_ready(hs)
N = 64
t0 = time.perf_counter()
for _ in range(N // STEPS):
    kv, hs = bs_jit(params, kv, lengths, STEPS)
jax.block_until_ready(hs)
dt = (time.perf_counter() - t0) / N
w_gb = 0.52e9 * 2 / 1e9
kv_gb = S * MAX_LEN * t3.num_kv_heads * t3.head_dim * 2 * 2 * t3.num_layers / 1e9
print(f"backbone-only step: {dt*1e3:.3f} ms  -> {1/dt:.0f} steps/s")
print(f"  weights {w_gb:.2f} GB + kv(full) {kv_gb:.2f} GB = {(w_gb+kv_gb):.2f} GB")
print(f"  implied BW {(w_gb+kv_gb)/dt:.0f} GB/s  (v5e SoL ~819)")

# --- full engine decode chunk ------------------------------------------------
sampling = SamplingState.broadcast(B, temperature=0.8, top_p=0.8,
                                   repetition_penalty=2.0)
state = DecodeState(
    kv=KVCache.zeros(t3, S, MAX_LEN, jnp.bfloat16),
    lengths=jnp.full((S,), 100, jnp.int32),
    speech_pos=jnp.ones((B,), jnp.int32),
    last_token=jnp.zeros((B,), jnp.int32),
    prev_tokens=jnp.full((B, 2), -1, jnp.int32),
    completed_at=jnp.full((B,), -1, jnp.int32),
    seen=jnp.zeros((B, t3.speech_vocab_size), bool),
    done=jnp.zeros((B,), bool),
    stopped=jnp.zeros((B,), bool),
    n_generated=jnp.ones((B,), jnp.int32),
    out_tokens=jnp.zeros((B, MAX_LEN), jnp.int32),
    key=jax.random.PRNGKey(0),
)
cfg_scale = jnp.full((B,), 0.5, jnp.float32)
max_new = jnp.full((B,), 10**9, jnp.int32)
text_len = jnp.full((B,), 40, jnp.int32)
state = eng._decode_chunk(params, state, sampling, cfg_scale, max_new, text_len,
                          num_steps=STEPS)
jax.block_until_ready(state.out_tokens)
t0 = time.perf_counter()
for _ in range(N // STEPS):
    state = eng._decode_chunk(params, state, sampling, cfg_scale, max_new,
                              text_len, num_steps=STEPS)
jax.block_until_ready(state.out_tokens)
dt = (time.perf_counter() - t0) / N
print(f"engine decode step: {dt*1e3:.3f} ms  -> {1/dt:.0f} steps/s "
      f"({B}-pair aggregate {B/dt:.0f} tok/s)")
