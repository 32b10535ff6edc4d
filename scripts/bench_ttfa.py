"""Batch-1 latency (TTFA proxy) through the continuous serving engine:
occupancy pair-bucket ON vs OFF (VERDICT r3 weak #4 / next-round item 8).

Measures wall time for ONE request to produce its first N speech tokens in a
B=8-pair engine, with and without the sliced-prefix decode bucket.

    python scripts/bench_ttfa.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_vllm2_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from chatterbox_vllm2_tpu.config import Config, EngineConfig, SamplingConfig, T3Config
from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
from chatterbox_vllm2_tpu.engine.scheduler import ContinuousEngine
from chatterbox_vllm2_tpu.models.t3.model import init_t3_params

N_TOKENS = 48


def build(buckets):
    t3 = T3Config.multilingual()
    cfg = Config(t3=t3, engine=EngineConfig(
        max_batch_size=8, max_model_len=384, prefill_buckets=(64,),
        quant_mode="int8", cache_len_schedule="single",
        decode_steps_per_dispatch=16, pair_buckets=buckets))
    params = init_t3_params(0, t3, jnp.bfloat16)
    return ContinuousEngine(T3Engine(cfg, params))


def one_request(i):
    rng = np.random.RandomState(i)
    return T3Request(
        text_ids=rng.randint(1, 2454, size=40).astype(np.int32),
        cond_emb=(rng.randn(34, 1024) * 0.02).astype(np.float32),
        sampling=SamplingConfig(temperature=0.8, top_p=0.8,
                                repetition_penalty=2.0),
        max_new_tokens=N_TOKENS, seed=i)


def measure(eng, label):
    eng.generate([one_request(0)])            # compile + warm
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        res = eng.generate([one_request(1 + i)])
        best = min(best, time.time() - t0)
    toks = len(res[0].tokens)
    print(f"{label}: {best*1000:7.1f} ms for first {toks} tokens "
          f"({best/max(toks,1)*1000:.2f} ms/token)")
    return best


def main():
    t_off = measure(build(()), "bucket OFF (full 8-pair shapes)")
    t_on = measure(build((1, 2, 4)), "bucket ON  (1-pair slice)   ")
    print(f"single-request latency improvement: {t_off / t_on:.2f}x")


if __name__ == "__main__":
    main()
