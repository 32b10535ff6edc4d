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

    # sampled-stream agreement (temp 0.8): how soon a quantization-flipped
    # sample makes the streams diverge permanently.  NOTE the random-weight
    # caveat: logits here are near-flat (no checkpoints in this sandbox), so
    # any perturbation eventually flips a sample and everything after the
    # first flip differs by construction — first_divergence is the signal,
    # and trained (peaked) weights would score far higher.  Greedy agreement
    # is NOT reported: argmax over near-uniform random-weight logits is a
    # pure knife-edge (measured diverging at token ~2 even for int8) and
    # says nothing about quantization quality.
    engines = {m: build(m) for m in ("none",) + tuple(modes)}
    out = {}
    ref = engines["none"].generate(requests(0.8))
    for mode in modes:
        res = engines[mode].generate(requests(0.8))
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
        out[mode] = {"sampled": {
            "token_agreement": round(float(np.mean(agree)), 4),
            "first_divergence": round(float(np.mean(first)), 1),
            "len_ratio": round(float(np.mean(lens)), 4)}}
    return out


def t3_logit_fidelity(pairs=4, modes=("int8", "int4_awq")):
    """Feedback-free quantization fidelity: the CFG-combined first-token
    logits of a prefill on IDENTICAL inputs, quantized vs bf16 — relative L2
    error, top-1 agreement, and top-8 overlap.  This is the direct measure
    (no token-feedback compounding), meaningful even with random weights."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chatterbox_vllm2_tpu.config import T3Config
    from chatterbox_vllm2_tpu.models.t3.model import (
        KVCache, build_prefill_embeds, cfg_combine, init_t3_params,
        make_rope_tables, speech_logits, t3_prefill)
    from chatterbox_vllm2_tpu.ops.quant_matmul import quantize_t3_params

    cfg = T3Config.multilingual()
    base = init_t3_params(0, cfg, jnp.bfloat16)
    rng = np.random.RandomState(0)
    n = pairs
    text_ids = rng.randint(1, 2454, size=(n, 40)).astype(np.int32)
    text_len = np.full((n,), 40, np.int32)
    cond = (rng.randn(n, 34, 1024) * 0.02).astype(np.float32)
    cos, sin = make_rope_tables(cfg, 256)

    @jax.jit
    def first_logits(params):
        embeds, positions, prefill_len = build_prefill_embeds(
            params, cfg, jnp.asarray(cond, jnp.bfloat16),
            jnp.asarray(text_ids), jnp.asarray(text_len))
        kv = KVCache.zeros(cfg, 2 * n, embeds.shape[1], jnp.bfloat16)
        hidden, _ = t3_prefill(params, cfg, embeds, positions, prefill_len,
                               kv, cos, sin)
        last = hidden[jnp.arange(2 * n), prefill_len - 1]
        return cfg_combine(speech_logits(params, last, cfg.speech_vocab_size),
                           jnp.full((n,), 0.5, jnp.float32))

    ref = np.asarray(first_logits(base))
    out = {}
    for mode in modes:
        got = np.asarray(first_logits(quantize_t3_params(base, mode)))
        rel = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9))
        top1 = float(np.mean(got.argmax(-1) == ref.argmax(-1)))
        k = 8
        ov = np.mean([len(np.intersect1d(
            np.argpartition(-got[i], k)[:k], np.argpartition(-ref[i], k)[:k]))
            / k for i in range(n)])
        out[mode] = {"logit_rel_l2": round(rel, 4),
                     "top1_agreement": round(top1, 3),
                     "top8_overlap": round(float(ov), 3)}
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

    out = {"t3": t3_token_agreement(args.pairs, args.tokens),
           "t3_logits": t3_logit_fidelity(args.pairs)}
    if not args.skip_s3gen:
        out["s3gen_int8"] = s3gen_waveform_deviation()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
