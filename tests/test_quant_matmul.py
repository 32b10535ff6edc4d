"""Quantized matmul tests (interpret mode on CPU; compiled on TPU).

Strategy per SURVEY.md §4: kernels are checked against reference-dtype
einsums over the dequantized weights, plus an end-to-end logits-tolerance
test of the quantized engine vs the dense one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_vllm2_tpu.ops.quant_matmul import (
    QuantTensor,
    dequantize_tensor,
    quant_einsum,
    quantize_t3_params,
    quantize_tensor,
)


@pytest.mark.parametrize("bits", [4, 8])
def test_quantize_dequantize_roundtrip(bits):
    rng = np.random.RandomState(0)
    w = rng.randn(512, 256).astype(np.float32) * 0.05
    q = quantize_tensor(w, bits=bits, group_size=128)
    wd = np.asarray(dequantize_tensor(q))
    # quantization error bounded by half a step per element
    if bits == 8:
        step = np.abs(w).max(axis=0, keepdims=True) / 127.0
    else:
        grp = w.reshape(-1, 128, 256)
        step = ((grp.max(1) - grp.min(1)) / 15.0).repeat(128, 0).reshape(w.shape)
    assert np.all(np.abs(wd - w) <= 0.51 * step + 1e-6)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("m", [2, 16, 100])
def test_quant_einsum_matches_dequant(bits, m):
    rng = np.random.RandomState(1)
    K, N = 512, 384 if bits == 8 else 512
    w = rng.randn(K, N).astype(np.float32) * 0.05
    x = rng.randn(m, K).astype(np.float32)
    q = quantize_tensor(w, bits=bits, group_size=128)
    out = np.asarray(quant_einsum(jnp.asarray(x), q))
    ref = x @ np.asarray(dequantize_tensor(q))
    # int8 adds activation-quantization noise; int4 computes in bf16 on the
    # MXU — both bounded by ~1% of the output magnitude
    np.testing.assert_allclose(out, ref, atol=0.012 * np.abs(ref).max())


def test_quant_einsum_3d_input():
    rng = np.random.RandomState(2)
    w = rng.randn(256, 256).astype(np.float32) * 0.05
    x = rng.randn(3, 5, 256).astype(np.float32)
    q = quantize_tensor(w, bits=4, group_size=128)
    out = np.asarray(quant_einsum(jnp.asarray(x), q))
    assert out.shape == (3, 5, 256)
    ref = x @ np.asarray(dequantize_tensor(q))
    np.testing.assert_allclose(out, ref, atol=0.012 * np.abs(ref).max())


def test_stacked_quantization_and_indexing():
    rng = np.random.RandomState(3)
    w = rng.randn(4, 256, 256).astype(np.float32) * 0.05
    q = quantize_tensor(w, bits=4, group_size=128)
    assert q.data.shape == (4, 128, 256)
    # static per-layer view via tree-map (how model._layer_params slices)
    q1 = jax.tree.map(lambda a: a[1], q)
    np.testing.assert_allclose(np.asarray(dequantize_tensor(q1)),
                               np.asarray(dequantize_tensor(q))[1])


@pytest.mark.parametrize("mode", ["int8", "int4_awq"])
def test_quantized_engine_logits_close_to_dense(mode):
    """End-to-end: quantized T3 engine greedy tokens track the dense engine
    on a tiny random model (quant_mode honored through the serving path)."""
    from chatterbox_vllm2_tpu.config import (
        Config, EngineConfig, SamplingConfig, T3Config)
    from chatterbox_vllm2_tpu.engine.engine import T3Engine, T3Request
    from chatterbox_vllm2_tpu.models.t3.model import init_t3_params
    import dataclasses

    # tiny but quantization-compatible dims (K divisible by 2*group for int4)
    cfg = dataclasses.replace(
        T3Config.tiny(), hidden_size=256, intermediate_size=512,
        num_heads=4, num_kv_heads=4, head_dim=64)
    params = init_t3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    base = Config(t3=cfg, engine=EngineConfig(
        max_batch_size=2, max_model_len=96, prefill_buckets=(16,),
        kv_cache_dtype="float32", enable_analyzer=False))
    dense = T3Engine(base, params, compute_dtype=jnp.float32)
    quant = T3Engine(base.replace(engine=dataclasses.replace(
        base.engine, quant_mode=mode)), params, compute_dtype=jnp.float32)

    cond = (np.random.RandomState(0).randn(cfg.cond_seq_len, cfg.hidden_size)
            .astype(np.float32) * 0.1)
    greedy = SamplingConfig(temperature=0.0, top_p=1.0, repetition_penalty=1.0)
    reqs = [T3Request(text_ids=np.arange(1, 10, dtype=np.int32), cond_emb=cond,
                      sampling=greedy, max_new_tokens=10)]
    out_d = dense.generate(reqs)[0].tokens
    out_q = quant.generate(reqs)[0].tokens
    assert len(out_q) > 0 and len(out_d) > 0

    # logits fidelity: prefill-step logits of the quantized backbone must be
    # strongly correlated with the dense ones (random tiny models have
    # near-uniform logits, so token-level agreement is not a fair check)
    from chatterbox_vllm2_tpu.models.t3.model import (
        KVCache, build_prefill_embeds, make_rope_tables, speech_logits,
        t3_prefill)
    cos_t, sin_t = make_rope_tables(cfg, 96)
    ids = jnp.asarray(np.arange(1, 10, dtype=np.int32))[None]
    tlen = jnp.asarray([9], jnp.int32)
    logits = {}
    for name, p in (("dense", dense.params), ("quant", quant.params)):
        emb, pos, plen = build_prefill_embeds(
            p, cfg, jnp.asarray(cond, jnp.float32)[None], ids, tlen)
        kv = KVCache.zeros(cfg, 2, 96, jnp.float32)
        hid, _ = t3_prefill(p, cfg, emb, pos, plen, kv, cos_t, sin_t)
        last = hid[jnp.arange(2), plen - 1]
        logits[name] = np.asarray(
            speech_logits(p, last, cfg.speech_vocab_size))
    a, b = logits["dense"], logits["quant"]
    cossim = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cossim.min() > 0.97, cossim
