"""Roofline harness for the T3 decode step on the local chip.

Measures the per-step wall time of the jitted decode chunk at several batch
sizes / cache lengths / quant modes and compares against the HBM roofline
(weight bytes + KV read bytes per step over ~819 GB/s on v5e), printing the
achieved fraction of speed-of-light.  Usage:

    python scripts/profile_decode.py [quant_mode] [--trace DIR]

With --trace, wraps the steady-state run in jax.profiler for xprof analysis.
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

HBM_GBPS = 819.0  # v5e


def weight_bytes(cfg: T3Config, quant: str) -> int:
    per_param = {"none": 2, "int8": 1, "int4_awq": 0.5}[quant]
    h, nh, hd, inter = (cfg.hidden_size, cfg.num_heads, cfg.head_dim,
                        cfg.intermediate_size)
    L = cfg.num_layers
    lin = L * (h * nh * 3 * hd + nh * hd * h + h * 2 * inter + inter * h)
    head = h * cfg.speech_vocab_padded
    emb = cfg.speech_vocab_size * h * 2  # speech emb gather + pos emb (bf16)
    return int(lin * per_param + head * per_param + emb * 0.01)


def kv_bytes(cfg: T3Config, S: int, cache_len: int, dtype_bytes: int = 2) -> int:
    return 2 * cfg.num_layers * S * cfg.num_kv_heads * cache_len * cfg.head_dim * dtype_bytes


def bench_kernels(quant: str) -> None:
    """Per-kernel roofline: each backbone matmul at decode shapes (16 rows)
    vs its weight-bandwidth bound.  Chained executions + one device_get (the
    tunnel's block_until_ready returns early; see BENCH_NOTES.md).

    CAVEAT (measured 2026-08-21): isolated ops through the axon tunnel time
    ~270 us/call regardless of weight size (1-10 MB), while the full decode
    step averages ~8 us/op — isolated-op timing is NOT meaningful in this
    environment; use scripts/attr_backbone.py's full-step ablations instead.
    Kept for real (untunneled) TPU hosts."""
    import jax
    import jax.numpy as jnp

    from chatterbox_vllm2_tpu.ops.quant_matmul import (
        quant_einsum, quantize_tensor)

    t3 = T3Config.multilingual()
    h, nh, hd, inter = (t3.hidden_size, t3.num_heads, t3.head_dim,
                        t3.intermediate_size)
    shapes = {
        "qkv_proj": (h, nh * 3 * hd),
        "o_proj": (nh * hd, h),
        "gate_up_proj": (h, 2 * inter),
        "down_proj": (inter, h),
        "speech_head": (h, t3.speech_vocab_padded),
    }
    bits = {"none": 16, "int8": 8, "int4_awq": 4, "int4": 4}[quant]
    rng = np.random.RandomState(0)
    print(f"\nper-kernel roofline, quant={quant}, 16 decode rows, "
          f"HBM {HBM_GBPS:.0f} GB/s")
    print(f"{'kernel':>14} {'us/call':>8} {'SoL us':>7} {'SoL frac':>8}")
    for name, (K, N) in shapes.items():
        w = rng.randn(K, N).astype(np.float32) * 0.02
        wq = (jnp.asarray(w, jnp.bfloat16) if quant == "none"
              else quantize_tensor(w, bits=bits))
        x = jnp.asarray(rng.randn(16, K), jnp.bfloat16)

        @jax.jit
        def chain(x, wq=wq, K=K, N=N):
            def body(c, _):
                y = quant_einsum(c, wq)
                # cheap feedback keeping shape [16, K]
                return (c + y[:, :1].astype(c.dtype) * 1e-6
                        if y.shape[-1] >= 1 else c), None
            c, _ = jax.lax.scan(body, x, None, length=100)
            return c

        r = chain(x)
        _ = float(jax.device_get(r[0, 0]))
        t0 = time.time()
        r = chain(x)
        _ = float(jax.device_get(r[0, 0]))
        per_call = (time.time() - t0) / 100
        wbytes = K * N * bits / 8
        sol = wbytes / (HBM_GBPS * 1e9)
        print(f"{name:>14} {per_call*1e6:8.1f} {sol*1e6:7.1f} "
              f"{sol / per_call:8.1%}")


def main() -> None:
    quant = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "none"
    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
    if "--kernels" in sys.argv:
        bench_kernels(quant)
        return

    t3 = T3Config.multilingual()
    max_len = 384
    rows = []
    for B in (1, 4, 8):
        cfg = Config(
            t3=t3,
            engine=EngineConfig(max_batch_size=B, max_model_len=max_len,
                                prefill_buckets=(64,), quant_mode=quant,
                                cache_len_schedule="single"),
        )
        params = init_t3_params(0, t3, jnp.bfloat16)
        eng = T3Engine(cfg, params)
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
        eng.generate(reqs)                      # compile + warm
        if trace_dir and B == 8:
            jax.profiler.start_trace(trace_dir)
        t0 = time.time()
        res = eng.generate(reqs, seed=1)
        dt = time.time() - t0
        if trace_dir and B == 8:
            jax.profiler.stop_trace()
        steps = max(len(r.tokens) + (1 if r.finished_by_stop else 0) for r in res)
        total = sum(len(r.tokens) + (1 if r.finished_by_stop else 0) for r in res)
        step_ms = 1000.0 * dt / max(steps, 1)

        wb = weight_bytes(t3, quant)
        kb = kv_bytes(t3, 2 * B, max_len)
        roofline_ms = (wb + kb) / (HBM_GBPS * 1e9) * 1000.0
        rows.append((B, total / dt, step_ms, roofline_ms,
                     roofline_ms / step_ms))

    print(f"\nquant={quant}  (roofline = (weights {weight_bytes(t3, quant)/1e9:.2f} GB"
          f" + KV reads)/ {HBM_GBPS:.0f} GB/s)")
    print(f"{'pairs':>5} {'tok/s':>8} {'step ms':>8} {'SoL ms':>8} {'SoL frac':>8}")
    for B, tps, ms, roof, frac in rows:
        print(f"{B:>5} {tps:>8.1f} {ms:>8.2f} {roof:>8.2f} {frac:>8.1%}")


if __name__ == "__main__":
    main()
