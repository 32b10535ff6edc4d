"""A/B the paged engine's append strategies (dus vs staged) at serving
shapes with FORCED full-length generations (analyzer off, so streams run
all max_new_tokens and cache lengths actually reach the serving regime).

Alternates timed reps between the two engines in one session so chip-state
drift (±12% on the shared dev chip, BENCH_NOTES) cancels.

    python scripts/ab_paged_append.py [--pairs 16] [--tokens 600]
        [--max-len 1024] [--reps 3] [--kv-dtype bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_vllm2_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_vllm2_tpu.config import (Config, EngineConfig, SamplingConfig,
                                         T3Config)
from chatterbox_vllm2_tpu.engine import T3Request
from chatterbox_vllm2_tpu.engine.paged import PagedContinuousEngine
from chatterbox_vllm2_tpu.models.t3.model import init_t3_params


def make_requests(rng, B, n_tokens):
    return [
        T3Request(
            text_ids=rng.randint(1, 2454, size=40).astype(np.int32),
            cond_emb=(rng.randn(34, 1024) * 0.02).astype(np.float32),
            sampling=SamplingConfig(temperature=0.8, top_p=0.8,
                                    repetition_penalty=2.0),
            max_new_tokens=n_tokens)
        for _ in range(B)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=600)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--kv-dtype", default="bfloat16")
    args = ap.parse_args()

    t3 = T3Config.multilingual()
    params = init_t3_params(0, t3, jnp.bfloat16)
    engines = {}
    for mode in ("dus", "staged"):
        cfg = Config(t3=t3, engine=EngineConfig(
            max_batch_size=args.pairs, max_model_len=args.max_len,
            prefill_buckets=(64,), quant_mode=args.quant,
            cache_len_schedule="single", decode_steps_per_dispatch=32,
            kv_cache_dtype=args.kv_dtype, enable_analyzer=False,
            paged_append=mode))
        # halve utilization so BOTH engines' pools fit HBM together
        os.environ["CHATTERBOX_HBM_UTILIZATION"] = "0.40"
        eng = PagedContinuousEngine(cfg, params)
        print(f"[{mode}] pool pages={eng.P}", flush=True)
        engines[mode] = eng

    rng = np.random.RandomState(0)
    for mode, eng in engines.items():
        t0 = time.time()
        eng.generate(make_requests(rng, args.pairs, args.tokens), seed=1000)
        print(f"[{mode}] warm {time.time()-t0:.1f}s", flush=True)

    results = {m: [] for m in engines}
    for rep in range(args.reps):
        for mode, eng in engines.items():
            reqs = make_requests(rng, args.pairs, args.tokens)
            t0 = time.time()
            res = eng.generate(reqs, seed=100 + rep)
            dt = time.time() - t0
            total = sum(len(r.tokens) + (1 if r.finished_by_stop else 0)
                        for r in res)
            steps = max(len(r.tokens) + (1 if r.finished_by_stop else 0)
                        for r in res)
            results[mode].append((total / dt, 1000.0 * dt / steps, total))
            print(f"rep {rep} [{mode:6s}] {total/dt:7.1f} tok/s  "
                  f"{1000.0*dt/steps:5.2f} ms/step  ({total} tokens)",
                  flush=True)

    for mode, rs in results.items():
        tps = [r[0] for r in rs]
        ms = [r[1] for r in rs]
        print(f"[{mode:6s}] best {max(tps):7.1f} tok/s  median "
              f"{sorted(tps)[len(tps)//2]:7.1f}  ms/step best "
              f"{min(ms):5.2f}", flush=True)


if __name__ == "__main__":
    main()
