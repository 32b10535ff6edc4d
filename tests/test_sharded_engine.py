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
