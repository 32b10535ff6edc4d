"""Benchmark: T3 speech-token decode throughput on the local chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference reports ~180 speech tokens/s end-to-end on an RTX 3090
(reference README.md:325; BASELINE.md).  Weights are random (no checkpoints in
this environment) — decode throughput is weight-value independent.

Env knobs: BENCH_BATCH (CFG pairs, default 8), BENCH_TOKENS (default 256),
BENCH_MAX_LEN (default 384).
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chatterbox_vllm2_tpu.config import Config, EngineConfig, SamplingConfig, T3Config
    from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
    from chatterbox_vllm2_tpu.models.t3.model import init_t3_params

    B = int(os.environ.get("BENCH_BATCH", 8))
    n_tokens = int(os.environ.get("BENCH_TOKENS", 256))
    max_len = int(os.environ.get("BENCH_MAX_LEN", 384))

    cfg = Config(
        t3=T3Config.multilingual(),
        engine=EngineConfig(max_batch_size=B, max_model_len=max_len,
                            prefill_buckets=(64,)),
    )
    params = init_t3_params(jax.random.PRNGKey(0), cfg.t3, jnp.bfloat16)
    eng = T3Engine(cfg, params)

    rng = np.random.RandomState(0)
    # temperature>0 but repetition penalty active: realistic sampling cost;
    # max_new_tokens forces a fixed amount of work regardless of sampled ids.
    reqs = [
        T3Request(
            text_ids=rng.randint(1, 2454, size=40).astype(np.int32),
            cond_emb=(rng.randn(34, 1024) * 0.02).astype(np.float32),
            sampling=SamplingConfig(temperature=0.8, top_p=0.8,
                                    repetition_penalty=2.0),
            max_new_tokens=n_tokens,
        )
        for _ in range(B)
    ]

    eng.generate(reqs)  # compile + warm
    t0 = time.time()
    res = eng.generate(reqs, seed=1)
    dt = time.time() - t0
    total = sum(len(r.tokens) + (1 if r.finished_by_stop else 0) for r in res)
    tps = total / dt

    baseline = 180.0  # reference README.md:325 (RTX 3090)
    print(json.dumps({
        "metric": "speech_tokens_per_s",
        "value": round(tps, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
