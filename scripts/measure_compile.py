"""One-off: phase-by-phase timing of the bench workload on the real TPU.
Usage: python scripts/measure_compile.py [quant_mode]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_vllm2_tpu.utils.jit_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_vllm2_tpu.config import Config, EngineConfig, SamplingConfig, T3Config
from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
from chatterbox_vllm2_tpu.models.t3.model import init_t3_params

quant = sys.argv[1] if len(sys.argv) > 1 else "none"
B = 8
max_len = 384
T0 = time.time()


def mark(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


mark("start")
jax.devices()
mark("devices up")
cfg = Config(
    t3=T3Config.multilingual(),
    engine=EngineConfig(max_batch_size=B, max_model_len=max_len,
                        prefill_buckets=(64,), quant_mode=quant,
                        cache_len_schedule="single"),
)
params = init_t3_params(jax.random.PRNGKey(0), cfg.t3, jnp.bfloat16)
jax.block_until_ready(params)
mark("params init")
eng = T3Engine(cfg, params)
mark("engine built (incl. quantize)")

rng = np.random.RandomState(0)
reqs = [
    T3Request(
        text_ids=rng.randint(1, 2454, size=40).astype(np.int32),
        cond_emb=(rng.randn(34, 1024) * 0.02).astype(np.float32),
        sampling=SamplingConfig(temperature=0.8, top_p=0.8,
                                repetition_penalty=2.0),
        max_new_tokens=256,
    )
    for _ in range(B)
]

res = eng.generate(reqs)
mark("first generate (compile)")
res = eng.generate(reqs, seed=1)
mark("second generate")
t0 = time.time()
res = eng.generate(reqs, seed=2)
dt = time.time() - t0
total = sum(len(r.tokens) + (1 if r.finished_by_stop else 0) for r in res)
mark(f"third generate: {dt:.2f}s, {total/dt:.1f} tok/s")
