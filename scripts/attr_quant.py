"""Roofline the quantized matmuls at decode shapes (VERDICT r4 item 6).

Per-kernel timing of the INT4 Pallas dequant+dot (`_qmm4`) vs the native
INT8 MXU dot vs the bf16 dot, at the T3 decode shapes (M = 2*pairs rows),
with bytes-moved rooflines.  Chained executions, one final get.

    python scripts/attr_quant.py [--m 32]
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

from chatterbox_vllm2_tpu.ops.quant_matmul import (
    QuantTensor, _int4_matmul, _int8_matmul, quantize_tensor)

# the four T3 decode matmuls (K, N) per layer
SHAPES = {"qkv": (1024, 3072), "o": (1024, 1024),
          "gate_up": (1024, 8192), "down": (4096, 1024)}
CALLS = 200


def chain(fn, x0, *args):
    @jax.jit
    def prog(x, *a):
        def body(c, _):
            y = fn(c, *a)
            # fold back into the input so the loop carries a dependency
            # (works for N != K: reduce y to a scalar contribution)
            return c + (jnp.sum(y) * 1e-12).astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, None, length=CALLS)
        return c
    return prog


def timeit(label, fn, x, *args, nbytes=0):
    prog = chain(fn, x, *args)
    out = prog(x, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = prog(x, *args)
    _ = float(jax.device_get(out).ravel()[0])
    dt = (time.perf_counter() - t0) / CALLS
    gbps = nbytes / dt / 1e9 if nbytes else 0.0
    print(f"  {dt*1e6:9.1f} us/call  {gbps:7.1f} GB/s  {label}", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32)
    args = ap.parse_args()
    M = args.m
    rng = np.random.RandomState(0)

    total = {"bf16": 0.0, "int8": 0.0, "int4": 0.0}
    for name, (K, N) in SHAPES.items():
        w = rng.randn(K, N).astype(np.float32) * 0.02
        x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        q8 = quantize_tensor(w, bits=8)
        q4 = quantize_tensor(w, bits=4, group_size=128)
        print(f"{name}: [{M},{K}] x [{K},{N}]")
        total["bf16"] += timeit(
            "bf16 dot", lambda x, w: (x @ w).astype(jnp.float32), x, wb,
            nbytes=K * N * 2)
        total["int8"] += timeit(
            "int8 MXU dot (dynamic act quant)",
            lambda x, d, s: _int8_matmul(x, QuantTensor(d, s, None, 8, 0)),
            x, q8.data, q8.scales, nbytes=K * N)
        total["int4"] += timeit(
            "int4 Pallas dequant+dot",
            lambda x, d, s, z: _int4_matmul(
                x, QuantTensor(d, s, z, 4, 128), interpret=False),
            x, q4.data, q4.scales, q4.zeros,
            nbytes=K * N // 2 + 2 * (K // 128) * N * 4)
    print("\nper-layer totals (4 matmuls):")
    for k, v in total.items():
        print(f"  {k}: {v*1e6:8.1f} us  -> 30 layers = {v*30*1e3:6.2f} ms/step")


if __name__ == "__main__":
    main()
