"""Batched S3Gen: batch results must match serial results per sample, and
the quantized audio stack must run close to dense.

The reference vocodes strictly serially per utterance (`tts.py:474-521`);
`S3GenEngine.inference_batch` shares one dispatch per bucket group with
per-sample PRNG keys, so a sample's output is independent of co-batched
traffic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_vllm2_tpu.config import (
    ConformerConfig,
    S3GenConfig,
    UNetConfig,
)
from chatterbox_vllm2_tpu.models.s3gen.s3gen import (
    RefDict,
    S3GenEngine,
    init_s3gen_params,
)


@pytest.fixture(scope="module")
def engine():
    cfg = dataclasses.replace(
        S3GenConfig(),
        encoder=dataclasses.replace(ConformerConfig(), output_size=64,
                                    attention_heads=2, linear_units=128,
                                    num_blocks=1, num_up_blocks=1,
                                    input_size=64),
        unet=dataclasses.replace(UNetConfig(), num_mid_blocks=1, channels=64),
    )
    params = init_s3gen_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return S3GenEngine(params, cfg, token_buckets=(32, 64),
                       max_prompt_tokens=16)


def _items(engine, n, rng):
    items = []
    for i in range(n):
        n_prompt = 8
        n_gen = 10 + 3 * i
        ref = RefDict(
            prompt_token=rng.randint(0, 100, n_prompt).astype(np.int32),
            prompt_feat=(rng.randn(2 * n_prompt, 80) * 0.1).astype(np.float32),
            embedding=rng.randn(192).astype(np.float32),
        )
        items.append((rng.randint(0, 100, n_gen).astype(np.int32), ref))
    return items


def test_batch_matches_serial(engine):
    rng = np.random.RandomState(0)
    items = _items(engine, 3, rng)
    seeds = [11, 22, 33]
    batched = engine.inference_batch(items, n_timesteps=2, seeds=seeds)
    for (toks, ref), seed, wav_b in zip(items, seeds, batched):
        wav_s = engine.inference(toks, ref, n_timesteps=2, seed=seed)
        assert wav_b.shape == wav_s.shape
        np.testing.assert_allclose(wav_b, wav_s, rtol=2e-4, atol=2e-4)


def test_same_seed_reproduces_across_batch_composition(engine):
    rng = np.random.RandomState(1)
    items = _items(engine, 4, rng)
    solo = engine.inference_batch([items[0]], n_timesteps=2, seeds=[7])[0]
    # same sample co-batched with three others, different order
    batt = engine.inference_batch([items[2], items[0], items[3], items[1]],
                                  n_timesteps=2, seeds=[1, 7, 2, 3])[1]
    np.testing.assert_allclose(solo, batt, rtol=2e-4, atol=2e-4)


def test_quantized_audio_stack_runs(engine):
    from chatterbox_vllm2_tpu.ops.quant_matmul import QuantTensor, quantize_linears

    rng = np.random.RandomState(2)
    items = _items(engine, 1, rng)
    dense = engine.inference_batch(items, n_timesteps=2, seeds=[5])[0]

    qparams = quantize_linears(engine.params, "int8", min_dim=64)
    n_q = len([1 for leaf in jax.tree.leaves(
        qparams, is_leaf=lambda x: isinstance(x, QuantTensor))
        if isinstance(leaf, QuantTensor)])
    assert n_q > 0, "no linears were quantized"
    qeng = S3GenEngine(qparams, engine.cfg, token_buckets=(32, 64),
                       max_prompt_tokens=16)
    quant = qeng.inference_batch(items, n_timesteps=2, seeds=[5])[0]
    assert quant.shape == dense.shape
    assert np.isfinite(quant).all()
    # int8 weight quant: outputs stay in the same ballpark
    scale = np.abs(dense).mean() + 1e-6
    assert np.abs(quant - dense).mean() / scale < 0.5
