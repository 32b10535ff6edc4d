"""One-off: measure compile time + steady-state step time of the current
decode program on the real TPU, for (a) the unrolled backbone as-is and
(b) varying decode_steps_per_dispatch, to decide how to fix the bench timeout.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_vllm2_tpu.config import Config, EngineConfig, SamplingConfig, T3Config
from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
from chatterbox_vllm2_tpu.models.t3.model import init_t3_params

B = 8
max_len = 384
cfg = Config(
    t3=T3Config.multilingual(),
    engine=EngineConfig(max_batch_size=B, max_model_len=max_len,
                        prefill_buckets=(64,), decode_steps_per_dispatch=32),
)
t0 = time.time()
params = init_t3_params(jax.random.PRNGKey(0), cfg.t3, jnp.bfloat16)
eng = T3Engine(cfg, params)
print(f"init: {time.time()-t0:.1f}s", flush=True)

rng = np.random.RandomState(0)
reqs = [
    T3Request(
        text_ids=rng.randint(1, 2454, size=40).astype(np.int32),
        cond_emb=(rng.randn(34, 1024) * 0.02).astype(np.float32),
        sampling=SamplingConfig(temperature=0.8, top_p=0.8, repetition_penalty=2.0),
        max_new_tokens=64,
    )
    for _ in range(B)
]

t0 = time.time()
res = eng.generate(reqs)
print(f"first generate (compile, 64 tok): {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
res = eng.generate(reqs, seed=1)
dt = time.time() - t0
total = sum(len(r.tokens) + 1 for r in res)
print(f"warm generate: {dt:.2f}s, {total/dt:.1f} tok/s", flush=True)
