"""T3 model unit tests: shapes, KV-cache consistency, CFG semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_vllm2_tpu.config import Config, EngineConfig, T3Config
from chatterbox_vllm2_tpu.models.t3.model import (
    KVCache,
    build_decode_embeds,
    build_prefill_embeds,
    cfg_combine,
    init_t3_params,
    make_rope_tables,
    speech_logits,
    t3_decode,
    t3_prefill,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = T3Config.tiny()
    params = init_t3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, params


def test_prefill_embed_layout(tiny):
    cfg, params = tiny
    B, Tt = 2, 8
    cond = jnp.ones((B, cfg.cond_seq_len, cfg.hidden_size))
    ids = jnp.zeros((B, Tt), jnp.int32).at[0, :5].set(jnp.arange(1, 6)).at[1, :3].set(7)
    tlen = jnp.asarray([5, 3], jnp.int32)
    emb, pos, plen = build_prefill_embeds(params, cfg, cond, ids, tlen)
    assert emb.shape == (2 * B, cfg.cond_seq_len + Tt + 1, cfg.hidden_size)
    np.testing.assert_array_equal(np.asarray(plen), [40, 40, 38, 38])
    # uncond rows zero the text embeddings but keep cond prefix and SOS
    C = cfg.cond_seq_len
    np.testing.assert_allclose(np.asarray(emb[1, C : C + 5]), 0.0)
    assert np.abs(np.asarray(emb[0, C : C + 5])).sum() > 0
    # SOS rows match between cond/uncond at index C + text_len
    np.testing.assert_allclose(np.asarray(emb[0, C + 5]), np.asarray(emb[1, C + 5]))
    sos_expected = params["speech_emb"][cfg.start_speech_token] + params["speech_pos_emb"][0]
    np.testing.assert_allclose(np.asarray(emb[2, C + 3]), np.asarray(sos_expected), rtol=1e-6)


def test_prefill_decode_consistency(tiny):
    """Decoding token-by-token with the KV cache must match prefilling the
    whole sequence at once (same hidden states at every position)."""
    cfg, params = tiny
    max_len = 32
    S = 2
    cos, sin = make_rope_tables(cfg, max_len)
    rng = jax.random.PRNGKey(1)
    T_full = 10
    x_full = jax.random.normal(rng, (S, T_full, cfg.hidden_size))
    pos = jnp.broadcast_to(jnp.arange(T_full), (S, T_full)).astype(jnp.int32)

    # one-shot
    kv = KVCache.zeros(cfg, S, max_len, jnp.float32)
    plen = jnp.full((S,), T_full, jnp.int32)
    h_full, _ = t3_prefill(params, cfg, x_full, pos, plen, kv, cos, sin)

    # prefill 6 then decode 4 one token at a time
    kv = KVCache.zeros(cfg, S, max_len, jnp.float32)
    T_pre = 6
    plen = jnp.full((S,), T_pre, jnp.int32)
    h_pre, kv = t3_prefill(params, cfg, x_full[:, :T_pre], pos[:, :T_pre],
                           plen, kv, cos, sin)
    np.testing.assert_allclose(np.asarray(h_pre), np.asarray(h_full[:, :T_pre]),
                               rtol=2e-3, atol=1e-4)

    lengths = jnp.full((S,), T_pre, jnp.int32)
    for t in range(T_pre, T_full):
        h_t, kv = t3_decode(params, cfg, x_full[:, t], kv, lengths, cos, sin)
        np.testing.assert_allclose(np.asarray(h_t), np.asarray(h_full[:, t]),
                                   rtol=2e-3, atol=1e-4)
        lengths = lengths + 1


def test_decode_cache_len_bucket_equivalence(tiny):
    """Decoding with a tight static cache_len must equal full-cache decode."""
    cfg, params = tiny
    max_len, S, T_pre = 64, 2, 6
    cos, sin = make_rope_tables(cfg, max_len)
    x = jax.random.normal(jax.random.PRNGKey(2), (S, T_pre, cfg.hidden_size))
    pos = jnp.broadcast_to(jnp.arange(T_pre), (S, T_pre)).astype(jnp.int32)
    kv = KVCache.zeros(cfg, S, max_len, jnp.float32)
    _, kv = t3_prefill(params, cfg, x, pos, jnp.full((S,), T_pre, jnp.int32),
                       kv, cos, sin)
    lengths = jnp.full((S,), T_pre, jnp.int32)
    x_t = jax.random.normal(jax.random.PRNGKey(3), (S, cfg.hidden_size))
    h_full, _ = t3_decode(params, cfg, x_t, kv, lengths, cos, sin)
    h_tight, _ = t3_decode(params, cfg, x_t, kv, lengths, cos, sin,
                           cache_len=8)
    np.testing.assert_allclose(np.asarray(h_tight), np.asarray(h_full),
                               rtol=1e-5, atol=1e-6)


def test_cfg_combine():
    logits = jnp.asarray([
        [1.0, 2.0], [0.5, 1.0],   # pair 0: cond, uncond
        [2.0, 0.0], [2.0, 0.0],   # pair 1: identical -> combine is a no-op
    ])
    out = cfg_combine(logits, jnp.asarray([0.5, 0.7]))
    np.testing.assert_allclose(np.asarray(out[0]), [1.25, 2.5])
    np.testing.assert_allclose(np.asarray(out[1]), [2.0, 0.0])


def test_ragged_padding_never_leaks(tiny):
    """A short sequence's logits must be identical whether batched with a
    longer one (right-padded) or alone."""
    cfg, params = tiny
    from chatterbox_vllm2_tpu.engine.engine import T3Engine, T3Request

    config = Config(
        t3=cfg,
        engine=EngineConfig(max_batch_size=2, max_model_len=96,
                            prefill_buckets=(16,), kv_cache_dtype="float32"),
    )
    eng = T3Engine(config, params, compute_dtype=jnp.float32)
    cond = np.random.RandomState(0).randn(cfg.cond_seq_len, cfg.hidden_size).astype(np.float32)
    from chatterbox_vllm2_tpu.config import SamplingConfig
    greedy = SamplingConfig(temperature=0.0, top_p=1.0, repetition_penalty=1.0)
    short = T3Request(text_ids=np.arange(1, 4, dtype=np.int32), cond_emb=cond,
                      sampling=greedy, max_new_tokens=8)
    long = T3Request(text_ids=np.arange(1, 13, dtype=np.int32), cond_emb=cond,
                     sampling=greedy, max_new_tokens=8)
    both = eng.generate([short, long])
    alone = eng.generate([short])
    np.testing.assert_array_equal(both[0].tokens, alone[0].tokens)


def test_per_request_seed_reproducible(tiny):
    """Same seed -> same tokens, regardless of what else is in the batch
    (ADVICE.md round 1: seeds must survive co-batching)."""
    cfg, params = tiny
    from chatterbox_vllm2_tpu.config import SamplingConfig
    from chatterbox_vllm2_tpu.engine.engine import T3Engine, T3Request

    config = Config(
        t3=cfg,
        engine=EngineConfig(max_batch_size=2, max_model_len=96,
                            prefill_buckets=(16,), kv_cache_dtype="float32",
                            enable_analyzer=False),
    )
    eng = T3Engine(config, params, compute_dtype=jnp.float32)
    cond = np.random.RandomState(0).randn(cfg.cond_seq_len, cfg.hidden_size).astype(np.float32)
    samp = SamplingConfig(temperature=0.9, top_p=0.95, repetition_penalty=1.3)
    mk = lambda seed: T3Request(text_ids=np.arange(1, 9, dtype=np.int32),
                                cond_emb=cond, sampling=samp,
                                max_new_tokens=12, seed=seed)
    other = T3Request(text_ids=np.arange(1, 5, dtype=np.int32), cond_emb=cond,
                      sampling=samp, max_new_tokens=12, seed=999)
    alone = eng.generate([mk(42)])
    cobatched = eng.generate([other, mk(42)])
    np.testing.assert_array_equal(alone[0].tokens, cobatched[1].tokens)


def test_dense_engine_occupancy_bucket_parity():
    """A short batch through the dense engine's sliced-prefix decode bucket
    must reproduce the full-batch tokens (VERDICT r3 weak #4)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from chatterbox_vllm2_tpu.config import (Config, EngineConfig,
                                             SamplingConfig, T3Config)
    from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
    from chatterbox_vllm2_tpu.models.t3.model import init_t3_params

    t3 = T3Config.tiny()
    params = init_t3_params(0, t3, jnp.float32)

    def run(buckets):
        cfg = Config(t3=t3, engine=EngineConfig(
            max_batch_size=4, max_model_len=64, prefill_buckets=(16,),
            kv_cache_dtype="float32", decode_steps_per_dispatch=4,
            pair_buckets=buckets))
        eng = T3Engine(cfg, params, compute_dtype=jnp.float32)
        rng = np.random.RandomState(11)
        reqs = [T3Request(
            text_ids=rng.randint(1, t3.text_vocab_size, size=8).astype(np.int32),
            cond_emb=(rng.randn(t3.cond_seq_len, t3.hidden_size) * 0.02
                      ).astype(np.float32),
            sampling=SamplingConfig(temperature=0.8, top_p=0.9,
                                    repetition_penalty=1.3),
            max_new_tokens=10, seed=5)]
        return eng.generate(reqs)

    a = run((1, 2))[0]
    b = run(())[0]
    np.testing.assert_array_equal(a.tokens, b.tokens)


def test_blockwise_prefill_attention_matches_dense():
    """The query-blockwise path (T > threshold) must equal the one-einsum
    path bit-for-tolerance on the same inputs (long-text buckets)."""
    import chatterbox_vllm2_tpu.models.t3.model as M

    rng = np.random.RandomState(3)
    S, T, H, D = 2, 600, 4, 16          # T > PREFILL_BLOCKWISE_THRESHOLD
    q = jnp.asarray(rng.randn(S, T, H, D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(S, T, H, D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(S, T, H, D), jnp.float32) * 0.3
    lens = np.array([T, 431], np.int32)
    t_idx = np.arange(T)
    mask = jnp.asarray((t_idx[None, None, :] <= t_idx[None, :, None])
                       & (t_idx[None, None, :] < lens[:, None, None]))

    blockwise = M._prefill_attention(q, k, v, mask, D ** -0.5)

    thr = M.PREFILL_BLOCKWISE_THRESHOLD
    try:
        M.PREFILL_BLOCKWISE_THRESHOLD = 10 ** 9     # force the dense path
        dense = M._prefill_attention(q, k, v, mask, D ** -0.5)
    finally:
        M.PREFILL_BLOCKWISE_THRESHOLD = thr
    np.testing.assert_allclose(np.asarray(blockwise), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_long_text_prefill_endtoend():
    """A >threshold prefill runs through t3_prefill and produces logits plus
    a correctly-written KV cache (the 2048-token bucket's servability)."""
    from chatterbox_vllm2_tpu.config import T3Config
    from chatterbox_vllm2_tpu.models.t3.model import (
        KVCache, init_t3_params, make_rope_tables, t3_prefill)

    t3 = T3Config.tiny()
    params = init_t3_params(jax.random.PRNGKey(0), t3, jnp.float32)
    S, T = 2, 544                        # > threshold, not a block multiple
    rng = np.random.RandomState(4)
    embeds = jnp.asarray(rng.randn(S, T, t3.hidden_size), jnp.float32) * 0.02
    positions = jnp.broadcast_to(jnp.arange(T), (S, T))
    prefill_len = jnp.asarray([T, T - 37], jnp.int32)
    cos, sin = make_rope_tables(t3, T + 8)
    kv = KVCache.zeros(t3, S, T + 8, jnp.float32)
    hidden, kv = t3_prefill(params, t3, embeds, positions, prefill_len, kv,
                            cos, sin)
    assert hidden.shape == (S, T, t3.hidden_size)
    assert np.all(np.isfinite(np.asarray(hidden)))
    # K rows past a stream's true length exist (they're masked at read time);
    # rows within it must be nonzero
    assert float(jnp.abs(kv.k[:, :, :, : T - 37]).sum()) > 0
