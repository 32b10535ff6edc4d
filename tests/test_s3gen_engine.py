"""End-to-end S3Gen engine smoke test: tokens + random ref -> waveform,
with a reduced config so CPU compile stays fast."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_vllm2_tpu.config import ConformerConfig, S3GenConfig, UNetConfig
from chatterbox_vllm2_tpu.models.s3gen.s3gen import RefDict, S3GenEngine, init_s3gen_params


def small_cfg():
    return dataclasses.replace(
        S3GenConfig(),
        encoder=dataclasses.replace(ConformerConfig(), num_blocks=1, num_up_blocks=1,
                                    linear_units=256),
        unet=dataclasses.replace(UNetConfig(), num_mid_blocks=1, channels=64),
    )


def test_s3gen_engine_end_to_end():
    cfg = small_cfg()
    params = init_s3gen_params(jax.random.PRNGKey(0), cfg)
    eng = S3GenEngine(params, cfg, token_buckets=(64, 128), max_prompt_tokens=32)

    rng = np.random.RandomState(0)
    ref = RefDict(
        prompt_token=rng.randint(0, 6561, size=20).astype(np.int32),
        prompt_feat=rng.randn(40, 80).astype(np.float32),
        embedding=rng.randn(192).astype(np.float32),
    )
    tokens = rng.randint(0, 6561, size=30).astype(np.int32)
    wav = eng.inference(tokens, ref, n_timesteps=2)
    assert wav.shape == (30 * 960,)           # 2 mel/token * 480 samples/mel
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 0.99 + 1e-6
    # trim fade silences the first 20 ms
    assert np.abs(wav[:480]).max() == 0.0

    # same tokens, larger bucket via longer input -> prefix determinism not
    # required (different bucket), but same bucket must be deterministic
    wav2 = eng.inference(tokens, ref, n_timesteps=2)
    np.testing.assert_array_equal(wav, wav2)
