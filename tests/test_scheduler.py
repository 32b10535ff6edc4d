"""Continuous-batching scheduler tests (tiny random-weight T3, CPU).

The reference gets continuous batching from vLLM's scheduler (SURVEY.md §2.2);
here we verify our slot-level admission engine end-to-end: requests join and
leave the batch mid-flight, and greedy outputs are identical to the plain
batch engine (slot state is fully per-request isolated).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_vllm2_tpu.config import Config, EngineConfig, SamplingConfig, T3Config
from chatterbox_vllm2_tpu.engine import ContinuousEngine, T3Engine, T3Request
from chatterbox_vllm2_tpu.models.t3.model import init_t3_params


@pytest.fixture(scope="module")
def setup():
    t3 = T3Config.tiny()
    cfg = Config(
        t3=t3,
        engine=EngineConfig(max_batch_size=2, max_model_len=64,
                            prefill_buckets=(8, 16), kv_cache_dtype="float32",
                            decode_steps_per_dispatch=4),
    )
    params = init_t3_params(jax.random.PRNGKey(0), t3, jnp.float32)
    return cfg, params


def _requests(t3, n, greedy=True):
    rng = np.random.RandomState(0)
    reqs = []
    for i in range(n):
        L = int(rng.randint(4, 12))
        reqs.append(T3Request(
            text_ids=rng.randint(1, t3.text_vocab_size, size=L).astype(np.int32),
            cond_emb=(rng.randn(t3.cond_seq_len, t3.hidden_size) * 0.02
                      ).astype(np.float32),
            sampling=SamplingConfig(temperature=0.0 if greedy else 0.8,
                                    top_p=1.0, repetition_penalty=1.3,
                                    cfg_scale=0.5),
            max_new_tokens=6 + i,
        ))
    return reqs


def test_continuous_drains_more_requests_than_slots(setup):
    cfg, params = setup
    eng = ContinuousEngine(T3Engine(cfg, params, compute_dtype=jnp.float32))
    reqs = _requests(cfg.t3, 5)
    results = eng.run(reqs)
    assert len(results) == 5
    for r, req in zip(results, reqs):
        assert r.request_id == req.request_id
        assert len(r.tokens) <= req.max_new_tokens
        assert np.all(r.tokens >= 0)
        assert np.all(r.tokens < cfg.t3.speech_vocab_size)
    assert not eng.has_work


def test_continuous_matches_batch_engine_greedy(setup):
    """Greedy decode is RNG-free, so slot isolation implies identical tokens
    whether requests run all-at-once (batch engine) or staggered through
    continuous admission."""
    cfg, params = setup
    base = T3Engine(cfg, params, compute_dtype=jnp.float32)
    reqs = _requests(cfg.t3, 4)

    batch_results = base.generate(reqs)  # 2 sequential batches of 2
    cont = ContinuousEngine(T3Engine(cfg, params, compute_dtype=jnp.float32))
    cont_results = cont.run(_requests(cfg.t3, 4))

    for b, c in zip(batch_results, cont_results):
        np.testing.assert_array_equal(b.tokens, c.tokens)
        assert b.finished_by_stop == c.finished_by_stop


def test_mid_flight_admission(setup):
    """A request submitted after decoding started still completes."""
    cfg, params = setup
    eng = ContinuousEngine(T3Engine(cfg, params, compute_dtype=jnp.float32))
    reqs = _requests(cfg.t3, 3)
    eng.submit(reqs[0])
    eng.submit(reqs[1])
    eng.step()                      # both admitted, decoding
    rid3 = eng.submit(reqs[2])      # arrives mid-flight
    while eng.has_work:
        eng.step()
    assert rid3 in eng._results
    assert len(eng._results[rid3].tokens) <= reqs[2].max_new_tokens


def test_occupancy_bucket_matches_full_batch():
    """The batch-1 latency bucket (sliced decode chunk) must produce exactly
    the tokens of the full-batch chunk (VERDICT r3 weak #4)."""
    import dataclasses

    import jax.numpy as jnp

    from chatterbox_vllm2_tpu.config import (Config, EngineConfig,
                                             SamplingConfig, T3Config)
    from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
    from chatterbox_vllm2_tpu.engine.scheduler import ContinuousEngine
    from chatterbox_vllm2_tpu.models.t3.model import init_t3_params

    t3 = T3Config.tiny()
    params = init_t3_params(0, t3, jnp.float32)

    def build(buckets):
        cfg = Config(t3=t3, engine=EngineConfig(
            max_batch_size=4, max_model_len=64, prefill_buckets=(16,),
            kv_cache_dtype="float32", decode_steps_per_dispatch=4,
            pair_buckets=buckets))
        return ContinuousEngine(T3Engine(cfg, params, compute_dtype=jnp.float32))

    import numpy as np
    rng = np.random.RandomState(7)

    def reqs():
        r = np.random.RandomState(7)
        return [T3Request(
            text_ids=r.randint(1, t3.text_vocab_size, size=8).astype(np.int32),
            cond_emb=(r.randn(t3.cond_seq_len, t3.hidden_size) * 0.02
                      ).astype(np.float32),
            sampling=SamplingConfig(temperature=0.8, top_p=0.9,
                                    repetition_penalty=1.3),
            max_new_tokens=10, seed=42 + i) for i in range(2)]

    with_bucket = build((1, 2)).generate(reqs())
    without = build(()).generate(reqs())
    for a, b in zip(with_bucket, without):
        np.testing.assert_array_equal(a.tokens, b.tokens)
        assert a.finished_by_stop == b.finished_by_stop
