"""Isolate the paged-attention kernel's cost on this chip.

Compares per-call time of:
  1. our pair-lane Pallas kernel (manual multi-page DMA),
  2. a pure-XLA gather implementation (jnp.take of the page pool + einsum) —
     the no-Pallas fallback.

Chained executions, one final get.   python scripts/attr_paged_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_vllm2_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

B, H, D, bs, NB, L = 16, 16, 64, 128, 3, 30
D2 = 2 * D
P = B * NB
CALLS = 60          # kernel invocations per timed program (~2 decode steps)
LEN = 300


def chain(fn, q0, *args):
    @jax.jit
    def prog(q, *a):
        def body(c, _):
            out = fn(c, *a)
            return out.astype(c.dtype)[..., : c.shape[-1]], None
        c, _ = jax.lax.scan(body, q, None, length=CALLS)
        return c
    return prog


def timeit(label, prog, q0, *args):
    out = prog(q0, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = prog(q0, *args)
    _ = float(jax.device_get(out).ravel()[0])
    dt = time.perf_counter() - t0
    print(f"  {dt / CALLS * 1000:8.3f} ms/call  {label}", flush=True)


def main():
    rng = np.random.RandomState(0)
    tables = jnp.asarray(np.arange(P, dtype=np.int32).reshape(B, NB))
    lengths = jnp.full((B,), LEN, jnp.int32)

    # ---- 1. our kernel ---------------------------------------------------
    from chatterbox_vllm2_tpu.ops.paged_attention import paged_attention_pairs

    kp = jnp.asarray(rng.randn(L, P, H, bs, D2), jnp.bfloat16) * 0.3
    vp = jnp.asarray(rng.randn(L, P, H, bs, D2), jnp.bfloat16) * 0.3
    q = jnp.asarray(rng.randn(B, H, D2), jnp.bfloat16) * 0.3

    def ours(q, kp, vp):
        return paged_attention_pairs(
            q, kp, vp, tables, lengths, 7, block_size=bs,
            sm_scale=D ** -0.5, interpret=False)

    timeit("ours bf16 (pair-lane, manual DMA)", chain(ours, q, kp, vp),
           q, kp, vp)

    # int8
    kp8 = jnp.asarray(rng.randint(-127, 127, (L, P, H, bs, D2)), jnp.int8)
    vp8 = jnp.asarray(rng.randint(-127, 127, (L, P, H, bs, D2)), jnp.int8)
    ks = jnp.ones((L, P, H, bs), jnp.float32) * 0.01
    vs = jnp.ones((L, P, H, bs), jnp.float32) * 0.01

    def ours8(q, kp, vp, ks, vs):
        return paged_attention_pairs(
            q, kp, vp, tables, lengths, 7, block_size=bs,
            sm_scale=D ** -0.5, k_scales=ks, v_scales=vs, interpret=False)

    timeit("ours int8", chain(ours8, q, kp8, vp8, ks, vs),
           q, kp8, vp8, ks, vs)

    # ---- 3. pure-XLA gather --------------------------------------------
    def xla_gather(q, kp, vp):
        k = kp[7][tables]            # [B, NB, H, bs, D2] gather of the pages
        v = vp[7][tables]
        k = k.transpose(0, 2, 1, 3, 4).reshape(B, H, NB * bs, D2)
        v = v.transpose(0, 2, 1, 3, 4).reshape(B, H, NB * bs, D2)
        qq = q.reshape(B, H, 2, D).astype(jnp.bfloat16)
        kk = k.reshape(B, H, NB * bs, 2, D)
        scores = jnp.einsum("bhsd,bhtsd->bhst", qq, kk,
                            preferred_element_type=jnp.float32) * D ** -0.5
        mask = jnp.arange(NB * bs)[None, None, None, :] < lengths[:, None, None, None]
        scores = jnp.where(mask, scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        vv = v.reshape(B, H, NB * bs, 2, D)
        out = jnp.einsum("bhst,bhtsd->bhsd", p.astype(jnp.bfloat16), vv,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, H, D2)

    timeit("pure-XLA page gather + einsum", chain(xla_gather, q, kp, vp),
           q, kp, vp)


if __name__ == "__main__":
    main()
