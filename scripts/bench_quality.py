"""Quantization quality harness (VERDICT r4 item 5).

Measures, at fixed seeds, what quantization actually costs:
  * T3: position-wise token agreement vs the bf16 engine for quant_mode
    int8 / int4_awq (same requests, same per-request PRNG seeds — tokens can
    only diverge where quantization flips a sampled choice);
  * S3Gen: waveform deviation of int8 `quantize_linears` vs fp32 at fixed
    tokens/noise (the bnb-analog path, reference `quantization.py:80-139`).

This is the measurable stand-in for BASELINE's "WER parity at the same INT4
bit-width" (no ASR model ships in this sandbox).  Emits one JSON line; also
imported by bench.py for the bench's `quality` block.

    python scripts/bench_quality.py [--pairs 4] [--tokens 128]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_vllm2_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()


def t3_token_agreement(pairs=4, tokens=128, max_len=384, modes=("int8", "int4_awq")):
    """Returns {mode: {agreement, mean_len_ratio}} vs the bf16 engine."""
    import jax.numpy as jnp
    import numpy as np

    from chatterbox_vllm2_tpu.config import Config, EngineConfig, SamplingConfig, T3Config
    from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
    from chatterbox_vllm2_tpu.models.t3.model import init_t3_params

    def build(quant):
        cfg = Config(
            t3=T3Config.multilingual(),
            engine=EngineConfig(max_batch_size=pairs, max_model_len=max_len,
                                prefill_buckets=(64,), quant_mode=quant,
                                cache_len_schedule="single"))
        params = init_t3_params(0, cfg.t3, jnp.bfloat16)
        return T3Engine(cfg, params)

    def requests(temp):
        rng = np.random.RandomState(0)
        return [
            T3Request(
                text_ids=rng.randint(1, 2454, size=40).astype(np.int32),
                cond_emb=(rng.randn(34, 1024) * 0.02).astype(np.float32),
                sampling=SamplingConfig(temperature=temp, top_p=0.8,
                                        repetition_penalty=2.0),
                max_new_tokens=tokens, seed=1000 + i)
            for i in range(pairs)
        ]

    # both regimes: greedy isolates "did quantization change the argmax";
    # sampled (temp 0.8) additionally shows how soon a flipped sample makes
    # the streams diverge permanently (with random weights the logits are
    # near-flat, so sampled agreement is a pessimistic bound — a flat
    # distribution flips on any perturbation; trained weights are peaked)
    engines = {m: build(m) for m in ("none",) + tuple(modes)}
    out = {}
    for temp, tag in ((0.0, "greedy"), (0.8, "sampled")):
        ref = engines["none"].generate(requests(temp))
        for mode in modes:
            res = engines[mode].generate(requests(temp))
            agree, lens, first = [], [], []
            for r0, r1 in zip(ref, res):
                a, b = r0.tokens, r1.tokens
                n = min(len(a), len(b))
                if n == 0:
                    agree.append(1.0 if len(a) == len(b) else 0.0)
                    first.append(0)
                else:
                    eq = a[:n] == b[:n]
                    agree.append(float(np.mean(eq)))
                    div = np.flatnonzero(~eq)
                    first.append(int(div[0]) if len(div) else n)
                lens.append(len(b) / max(len(a), 1))
            out.setdefault(mode, {})[tag] = {
                "token_agreement": round(float(np.mean(agree)), 4),
                "first_divergence": round(float(np.mean(first)), 1),
                "len_ratio": round(float(np.mean(lens)), 4)}
    return out


def s3gen_waveform_deviation(n_utts=2, n_tok=128):
    """int8-quantized S3Gen linears vs fp32: max-abs and mean-relative
    waveform deviation at identical tokens/seeds."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chatterbox_vllm2_tpu.config import S3GenConfig
    from chatterbox_vllm2_tpu.models.s3gen.s3gen import (
        RefDict, S3GenEngine, init_s3gen_params)
    from chatterbox_vllm2_tpu.ops.quant_matmul import quantize_linears

    cfg = S3GenConfig()
    params = init_s3gen_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    rng = np.random.RandomState(0)
    ref = RefDict(
        prompt_token=rng.randint(0, 6561, 50).astype(np.int32),
        prompt_feat=(rng.randn(100, 80) * 0.1).astype(np.float32),
        embedding=rng.randn(192).astype(np.float32))
    items = [(rng.randint(0, 6561, n_tok).astype(np.int32), ref)
             for _ in range(n_utts)]
    seeds = list(range(n_utts))

    buckets = (len(ref.prompt_token) + n_tok,)   # prompt + generated
    fp = S3GenEngine(params, cfg, token_buckets=buckets, max_prompt_tokens=64)
    w0 = fp.inference_batch(items, n_timesteps=10, seeds=seeds)
    q8 = S3GenEngine(quantize_linears(params, "int8"), cfg,
                     token_buckets=buckets, max_prompt_tokens=64)
    w1 = q8.inference_batch(items, n_timesteps=10, seeds=seeds)
    dev_max = max(float(np.max(np.abs(a - b))) for a, b in zip(w0, w1))
    denom = np.mean([np.mean(np.abs(a)) for a in w0]) + 1e-9
    rel = np.mean([np.mean(np.abs(a - b)) for a, b in zip(w0, w1)]) / denom
    return {"wav_dev_max": round(dev_max, 5),
            "wav_dev_mean_rel": round(float(rel), 5)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--skip-s3gen", action="store_true")
    args = ap.parse_args()

    out = {"t3": t3_token_agreement(args.pairs, args.tokens)}
    if not args.skip_s3gen:
        out["s3gen_int8"] = s3gen_waveform_deviation()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
