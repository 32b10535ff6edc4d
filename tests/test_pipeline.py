"""Full-pipeline smoke test: text + reference wav -> waveform, tiny configs,
random weights, CPU."""

import dataclasses
import json

import numpy as np
import pytest

import jax

from chatterbox_vllm2_tpu.config import (
    Config,
    ConformerConfig,
    EngineConfig,
    S3GenConfig,
    S3TokenizerConfig,
    T3Config,
    UNetConfig,
)
from chatterbox_vllm2_tpu.frontend.tokenizer import SpeechTextTokenizer
from chatterbox_vllm2_tpu.tts import ChatterboxTTS


@pytest.fixture(scope="module")
def tiny_vocab(tmp_path_factory):
    """Char-level tokenizer.json with the T3 special tokens."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE

    chars = list("abcdefghijklmnopqrstuvwxyz.,!?'\"-0123456789")
    vocab = {"[UNK]": 0}
    for i, c in enumerate(chars):
        vocab[c] = i + 1
    tok = Tokenizer(BPE(vocab=vocab, merges=[], unk_token="[UNK]"))
    tok.add_special_tokens(["[START]", "[STOP]", "[SPACE]"])
    path = tmp_path_factory.mktemp("vocab") / "tokenizer.json"
    tok.save(str(path))
    return str(path)


@pytest.fixture(scope="module")
def tts(tiny_vocab):
    t3 = T3Config.tiny()
    config = Config(
        t3=t3,
        engine=EngineConfig(max_batch_size=2, max_model_len=128,
                            prefill_buckets=(64,), kv_cache_dtype="float32"),
        s3gen=dataclasses.replace(
            S3GenConfig(),
            encoder=dataclasses.replace(ConformerConfig(), num_blocks=1,
                                        num_up_blocks=1, linear_units=128),
            unet=dataclasses.replace(UNetConfig(), num_mid_blocks=1, channels=64),
        ),
        s3tokenizer=dataclasses.replace(S3TokenizerConfig(), n_audio_state=64,
                                        n_audio_head=4, n_audio_layer=1),
    )
    import jax.numpy as jnp

    model = ChatterboxTTS.from_random(config, compute_dtype=jnp.float32)
    model.tokenizer = SpeechTextTokenizer(tiny_vocab, multilingual=False)
    # shrink the S3Gen engine buckets for CPU speed
    from chatterbox_vllm2_tpu.models.s3gen.s3gen import S3GenEngine

    model.s3gen = S3GenEngine(model.s3gen.params, config.s3gen,
                              token_buckets=(64, 128), max_prompt_tokens=32,
                              campplus_params=model.s3gen.campplus_params,
                              s3tok_model=model.s3gen.s3tok)
    return model


def test_pipeline_text_to_wav(tts, tmp_path):
    from chatterbox_vllm2_tpu.frontend.audio import write_wav

    rng = np.random.RandomState(0)
    ref = (rng.randn(24000) * 0.1).astype(np.float32)   # 1 s of noise "voice"
    wav_path = tmp_path / "ref.wav"
    wav_path.write_bytes(write_wav(ref, 24000))

    wavs = tts.generate(["hello world.", "ok."], audio_prompt_path=str(wav_path),
                        language_id="en", max_tokens=24, diffusion_steps=2)
    assert len(wavs) == 2
    for w in wavs:
        assert w.dtype == np.float32
        assert len(w) % 960 == 0
        assert np.isfinite(w).all()
    assert tts.metrics["speech_tokens"] > 0

    # conditioning is cached (reference lru_cache(10) behavior)
    c1 = tts.get_audio_conditionals(str(wav_path))
    c2 = tts.get_audio_conditionals(str(wav_path))
    assert c1 is c2


def test_pipeline_rejects_unknown_language(tts):
    with pytest.raises(ValueError, match="Unsupported language"):
        tts.generate("hi", language_id="xx")
