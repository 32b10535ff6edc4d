"""Quantized audio stack on the real chip (VERDICT r3 next-round item 7).

Times the full-size S3Gen engine fp32 vs INT8-quantized linears
(quantize_linears — the analog of the reference's bitsandbytes swap,
reference `quantization.py:80-139`) on identical inputs/seeds and reports
wall time + max/mean waveform deviation.

    python scripts/bench_s3gen_quant.py
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

from chatterbox_vllm2_tpu.config import S3GenConfig
from chatterbox_vllm2_tpu.models.s3gen.s3gen import (
    RefDict, S3GenEngine, init_s3gen_params,
)
from chatterbox_vllm2_tpu.ops.quant_matmul import quantize_linears


def run(engine, items, seeds, reps=2):
    engine.inference_batch(items, n_timesteps=10, seeds=seeds)   # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        wavs = engine.inference_batch(items, n_timesteps=10, seeds=seeds)
        best = min(best, time.time() - t0)
    return best, wavs


def main():
    cfg = S3GenConfig()
    params = init_s3gen_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    rng = np.random.RandomState(0)
    n_prompt, n_gen, B = 50, 128, 4
    ref = RefDict(
        prompt_token=rng.randint(0, 6561, n_prompt).astype(np.int32),
        prompt_feat=(rng.randn(2 * n_prompt, 80) * 0.1).astype(np.float32),
        embedding=rng.randn(192).astype(np.float32),
    )
    items = [(rng.randint(0, 6561, n_gen).astype(np.int32), ref)
             for _ in range(B)]
    seeds = list(range(B))

    fp32 = S3GenEngine(params, cfg, token_buckets=(256,), max_prompt_tokens=64)
    t_fp32, w_fp32 = run(fp32, items, seeds)
    audio_s = sum(len(w) for w in w_fp32) / 24000.0
    print(f"fp32:  {t_fp32:6.3f} s for {audio_s:.1f} s audio "
          f"(rtf {t_fp32 / audio_s:.4f})")

    q = S3GenEngine(quantize_linears(params, "int8"), cfg,
                    token_buckets=(256,), max_prompt_tokens=64)
    t_q, w_q = run(q, items, seeds)
    print(f"int8:  {t_q:6.3f} s for {audio_s:.1f} s audio "
          f"(rtf {t_q / audio_s:.4f}, {t_fp32 / t_q:.2f}x vs fp32)")

    dev_max = max(float(np.abs(a - b).max()) for a, b in zip(w_fp32, w_q))
    dev_mean = float(np.mean([np.abs(a - b).mean()
                              for a, b in zip(w_fp32, w_q)]))
    scale = float(np.mean([np.abs(a).mean() for a in w_fp32]))
    print(f"waveform deviation: max {dev_max:.4f}, mean {dev_mean:.5f} "
          f"(mean |fp32| {scale:.4f} -> rel {dev_mean / max(scale, 1e-9):.3f})")


if __name__ == "__main__":
    main()
