"""Hardware parity tests for the Pallas kernels — compiled, not interpreted.

Skipped unless the session runs with a real TPU backend
(`CHATTERBOX_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py`).
These are the "has this kernel ever actually compiled on a TPU" checks the
CPU suite cannot provide (CPU runs use interpret mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="needs a real TPU backend")


@tpu_only
def test_qmm4_compiled_matches_dequant():
    from chatterbox_vllm2_tpu.ops.quant_matmul import (
        _int4_matmul,
        dequantize_tensor,
        quantize_tensor,
    )

    rng = np.random.RandomState(0)
    K, N, M = 1024, 512, 32
    w = rng.randn(K, N).astype(np.float32) * 0.05
    q = quantize_tensor(w, bits=4, group_size=128)
    x = rng.randn(M, K).astype(np.float32)

    out = np.asarray(_int4_matmul(jnp.asarray(x), q, interpret=False))
    ref = np.asarray(jnp.asarray(x, jnp.bfloat16) @
                     dequantize_tensor(q).astype(jnp.bfloat16))
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


@tpu_only
def test_int8_matmul_compiled_matches_fp():
    from chatterbox_vllm2_tpu.ops.quant_matmul import quant_einsum, quantize_tensor

    rng = np.random.RandomState(1)
    K, N, M = 512, 256, 16
    w = rng.randn(K, N).astype(np.float32) * 0.05
    q = quantize_tensor(w, bits=8)
    x = rng.randn(M, K).astype(np.float32)
    out = np.asarray(quant_einsum(jnp.asarray(x), q))
    ref = x @ w
    # int8 weight + dynamic activation quant: ~1% relative error expected
    err = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert err < 0.02, err


@tpu_only
@pytest.mark.parametrize("quantized,bs", [(False, 64), (False, 128),
                                          (True, 128)])
def test_paged_attention_pairs_compiled_matches_dense(quantized, bs):
    from chatterbox_vllm2_tpu.ops.paged_attention import (
        pack_pairs, paged_attention_pairs, unpack_pairs,
        write_prefill_to_pages)

    rng = np.random.RandomState(2)
    B, H, D, NB, L = 4, 16, 64, 3, 2
    layer = 1
    S = 2 * B
    P = B * NB
    T = bs * NB
    lengths = np.array([17, 130, T, 80], np.int32)
    k = rng.randn(L, S, H, T, D).astype(np.float32) * 0.3
    v = rng.randn(L, S, H, T, D).astype(np.float32) * 0.3
    tables = np.arange(P, dtype=np.int32).reshape(B, NB)
    q = rng.randn(S, H, D).astype(np.float32) * 0.3

    kv_dtype = jnp.int8 if quantized else jnp.bfloat16
    kp = jnp.zeros((L, P, H, bs, 2 * D), kv_dtype)
    vp = jnp.zeros_like(kp)
    ks = jnp.zeros((L, P, H, bs), jnp.float32) if quantized else None
    vs = jnp.zeros((L, P, H, bs), jnp.float32) if quantized else None
    kp, vp, ks, vs = write_prefill_to_pages(
        kp, vp, jnp.asarray(k), jnp.asarray(v), jnp.asarray(tables),
        block_size=bs, k_scales=ks, v_scales=vs)

    out = np.asarray(unpack_pairs(paged_attention_pairs(
        pack_pairs(jnp.asarray(q)), kp, vp, jnp.asarray(tables),
        jnp.asarray(lengths), layer, block_size=bs, sm_scale=D ** -0.5,
        k_scales=ks, v_scales=vs, interpret=False)))

    # dense reference
    for s in range(S):
        n = int(lengths[s // 2])
        ks_ = k[layer, s, :, :n, :]
        vs_ = v[layer, s, :, :n, :]
        scores = np.einsum("hd,hld->hl", q[s], ks_) * (D ** -0.5)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        ref = np.einsum("hl,hld->hd", probs, vs_)
        np.testing.assert_allclose(out[s], ref, rtol=0.05, atol=0.05)


@tpu_only
def test_dense_decode_attention_compiled_matches_xla():
    """The fused dense decode-attention kernel (ops/dense_attention.py),
    COMPILED on hardware, vs the XLA einsum path — bf16 cache and INT8
    cache with per-(token, head) scales."""
    from chatterbox_vllm2_tpu.ops.dense_attention import dense_decode_attention

    rng = np.random.RandomState(3)
    L, S, H, M, D = 3, 8, 16, 128, 64
    k_cache = jnp.asarray(rng.randn(L, S, H, M, D) * 0.3, jnp.bfloat16)
    v_cache = jnp.asarray(rng.randn(L, S, H, M, D) * 0.3, jnp.bfloat16)
    q = jnp.asarray(rng.randn(S, H, D) * 0.3, jnp.bfloat16)
    lengths = jnp.asarray(rng.randint(5, M - 1, size=S), jnp.int32)
    layer = jnp.asarray(1, jnp.int32)
    scale = D ** -0.5

    def xla_ref(kc, vc):
        kk = kc[1]
        vv = vc[1]
        scores = jnp.einsum("shd,shmd->shm", q, kk,
                            preferred_element_type=jnp.float32) * scale
        mask = jnp.arange(M)[None, :] <= lengths[:, None]
        scores = jnp.where(mask[:, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        return np.asarray(jnp.einsum("shm,shmd->shd", probs.astype(vv.dtype),
                                     vv, preferred_element_type=jnp.float32))

    out = np.asarray(dense_decode_attention(
        q, k_cache, v_cache, layer, lengths, cache_len=M, sm_scale=scale,
        interpret=False))
    np.testing.assert_allclose(out, xla_ref(k_cache, v_cache),
                               rtol=0.05, atol=0.02)

    # INT8 cache path
    def quant(c):
        cf = c.astype(jnp.float32)
        amax = jnp.max(jnp.abs(cf), axis=-1)
        scl = jnp.maximum(amax, 1e-8) / 127.0
        qv = jnp.clip(jnp.round(cf / scl[..., None]), -127, 127).astype(jnp.int8)
        return qv, scl

    kq, ks = quant(k_cache)
    vq, vs = quant(v_cache)
    out8 = np.asarray(dense_decode_attention(
        q, kq, vq, layer, lengths, cache_len=M, sm_scale=scale,
        k_scales=ks, v_scales=vs, interpret=False))
    ref8 = xla_ref(kq.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16),
                   vq.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16))
    np.testing.assert_allclose(out8, ref8, rtol=0.08, atol=0.03)
