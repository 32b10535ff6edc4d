"""Parity tests for the fused dense decode-attention kernel
(ops/dense_attention.py) against the XLA einsum formulation — interpret mode
on CPU; the TPU-compiled path is covered by tests/test_tpu_kernels.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_vllm2_tpu.config import Config, EngineConfig, T3Config
from chatterbox_vllm2_tpu.models.t3.model import (
    KVCache, init_t3_params, make_rope_tables, t3_decode,
)
from chatterbox_vllm2_tpu.ops.dense_attention import (
    dense_decode_attention, quantize_kv_shd,
)


def _xla_reference(q, k_cache, v_cache, layer, lengths, cache_len, scale):
    kk = k_cache[layer][:, :, :cache_len, :]
    vv = v_cache[layer][:, :, :cache_len, :]
    scores = jnp.einsum("shd,shmd->shm", q, kk,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(cache_len)[None, :] <= lengths[:, None]
    scores = jnp.where(mask[:, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("shm,shmd->shd", probs.astype(vv.dtype), vv,
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("layer", [0, 2])
def test_kernel_matches_xla(layer):
    L, S, H, M, D = 3, 4, 4, 32, 16
    rng = np.random.RandomState(0)
    k_cache = jnp.asarray(rng.randn(L, S, H, M, D), jnp.float32)
    v_cache = jnp.asarray(rng.randn(L, S, H, M, D), jnp.float32)
    q = jnp.asarray(rng.randn(S, H, D), jnp.float32)
    lengths = jnp.asarray([5, 10, 31, 0], jnp.int32)
    scale = D ** -0.5
    want = _xla_reference(q, k_cache, v_cache, layer, lengths, M, scale)
    got = dense_decode_attention(q, k_cache, v_cache, jnp.asarray(layer),
                                 lengths, cache_len=M, sm_scale=scale,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_kernel_int8_matches_dequantized_xla():
    L, S, H, M, D = 2, 4, 4, 32, 16
    rng = np.random.RandomState(1)
    kf = jnp.asarray(rng.randn(L, S, H, M, D), jnp.float32)
    vf = jnp.asarray(rng.randn(L, S, H, M, D), jnp.float32)

    def quant(c):
        amax = jnp.max(jnp.abs(c), axis=-1)
        scl = jnp.maximum(amax, 1e-8) / 127.0
        qv = jnp.clip(jnp.round(c / scl[..., None]), -127, 127).astype(jnp.int8)
        return qv, scl

    kq, ks = quant(kf)
    vq, vs = quant(vf)
    q = jnp.asarray(rng.randn(S, H, D), jnp.float32)
    lengths = jnp.asarray([3, 17, 31, 8], jnp.int32)
    scale = D ** -0.5
    want = _xla_reference(q, kq.astype(jnp.float32) * ks[..., None],
                          vq.astype(jnp.float32) * vs[..., None],
                          1, lengths, M, scale)
    got = dense_decode_attention(q, kq, vq, jnp.asarray(1), lengths,
                                 cache_len=M, sm_scale=scale,
                                 k_scales=ks, v_scales=vs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_quantize_kv_shd_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 4, 16) * 3.0, jnp.float32)
    qv, scl = quantize_kv_shd(x)
    back = qv.astype(jnp.float32) * scl[..., None]
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               atol=float(jnp.max(jnp.abs(x))) / 120)


@pytest.mark.parametrize("layer_mode", ["scan", "unroll"])
def test_t3_decode_pallas_matches_xla(layer_mode):
    """Full decode step through t3_decode with both attention impls."""
    cfg = T3Config.tiny()
    params = init_t3_params(0, cfg, jnp.float32)
    S, max_len = 4, 32
    cos, sin = make_rope_tables(cfg, max_len)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(S, cfg.hidden_size) * 0.1, jnp.float32)
    kv0 = KVCache(
        jnp.asarray(rng.randn(cfg.num_layers, S, cfg.num_kv_heads, max_len,
                              cfg.head_dim) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(cfg.num_layers, S, cfg.num_kv_heads, max_len,
                              cfg.head_dim) * 0.1, jnp.float32),
    )
    lengths = jnp.asarray([4, 9, 16, 2], jnp.int32)

    h_x, kv_x = t3_decode(params, cfg, x, kv0, lengths, cos, sin,
                          cache_len=max_len, layer_mode=layer_mode,
                          attn_impl="xla")
    h_p, kv_p = t3_decode(params, cfg, x, kv0, lengths, cos, sin,
                          cache_len=max_len, layer_mode=layer_mode,
                          attn_impl="pallas", attn_interpret=True)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(kv_p.k), np.asarray(kv_x.k),
                               atol=1e-5, rtol=1e-5)
