"""API server tests: route parity with the reference `api_server.py` plus
the micro-batching service, against a tiny random-weight model on CPU."""

import dataclasses
import http.client
import json
import threading

import numpy as np
import pytest

import jax.numpy as jnp

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
from chatterbox_vllm2_tpu.server import (
    TTSService,
    ValidationError,
    VoiceRegistry,
    parse_tts_request,
)
from chatterbox_vllm2_tpu.server.http import serve_in_thread
from chatterbox_vllm2_tpu.tts import ChatterboxTTS


@pytest.fixture(scope="module")
def tiny_vocab(tmp_path_factory):
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
def service(tiny_vocab, tmp_path_factory):
    config = Config(
        t3=T3Config.tiny(),
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
    model = ChatterboxTTS.from_random(config, compute_dtype=jnp.float32)
    model.tokenizer = SpeechTextTokenizer(tiny_vocab, multilingual=False)
    from chatterbox_vllm2_tpu.models.s3gen.s3gen import S3GenEngine

    model.s3gen = S3GenEngine(model.s3gen.params, config.s3gen,
                              token_buckets=(64,), max_prompt_tokens=32,
                              campplus_params=model.s3gen.campplus_params,
                              s3tok_model=model.s3gen.s3tok)

    from chatterbox_vllm2_tpu.frontend.audio import write_wav

    rng = np.random.RandomState(0)
    voice_dir = tmp_path_factory.mktemp("voices")
    (voice_dir / "alloy.wav").write_bytes(
        write_wav((rng.randn(24000) * 0.1).astype(np.float32), 24000))

    svc = TTSService(model, VoiceRegistry(voice_dir=str(voice_dir)))
    yield svc
    svc.shutdown()


@pytest.fixture(scope="module")
def server(service):
    srv, port = serve_in_thread(service, quiet=True)
    yield port
    srv.shutdown()


def _req(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


# --------------------------------------------------------------------- #
# schema
# --------------------------------------------------------------------- #

def test_schema_defaults():
    r = parse_tts_request({"input": "hi"})
    assert (r.voice, r.response_format, r.speed) == ("alloy", "mp3", 1.0)
    assert (r.exaggeration, r.temperature) == (0.5, 0.8)


@pytest.mark.parametrize("body", [
    {},                                      # missing input
    {"input": ""},                           # empty
    {"input": "x" * 5000},                   # over 4096 (reference :34)
    {"input": "hi", "response_format": "ogg"},
    {"input": "hi", "speed": 9.0},
    {"input": "hi", "exaggeration": 3.0},
    {"input": "hi", "temperature": -1},
    "not a dict",
])
def test_schema_rejects(body):
    with pytest.raises(ValidationError):
        parse_tts_request(body)


# --------------------------------------------------------------------- #
# routes
# --------------------------------------------------------------------- #

def test_root_and_health_and_models(server):
    status, _, data = _req(server, "GET", "/")
    info = json.loads(data)
    assert status == 200 and "supported_languages" in info

    status, _, data = _req(server, "GET", "/health")
    h = json.loads(data)
    assert status == 200 and h["status"] == "healthy" and h["model_loaded"]

    status, _, data = _req(server, "GET", "/v1/models")
    m = json.loads(data)
    assert status == 200
    assert [x["id"] for x in m["data"]] == ["tts-1", "tts-1-hd"]

    status, ctype, data = _req(server, "GET", "/metrics")
    assert status == 200 and b"chatterbox_requests_total" in data

    status, _, _ = _req(server, "GET", "/nope")
    assert status == 404


def test_speech_wav(server):
    status, ctype, data = _req(server, "POST", "/v1/audio/speech", {
        "input": "hello there.", "voice": "alloy", "response_format": "wav",
        "max_tokens": 16, "diffusion_steps": 2,
    })
    assert status == 200, data
    assert ctype == "audio/wav" and data[:4] == b"RIFF"


def test_speech_pcm(server):
    status, ctype, data = _req(server, "POST", "/v1/audio/speech", {
        "input": "ok.", "response_format": "pcm",
        "max_tokens": 8, "diffusion_steps": 2,
    })
    assert status == 200
    assert ctype == "audio/pcm" and len(data) % 2 == 0


def test_speech_errors(server):
    status, _, data = _req(server, "POST", "/v1/audio/speech", {"input": ""})
    assert status == 400 and b"detail" in data

    status, _, data = _req(server, "POST", "/v1/audio/speech",
                           {"input": "hi", "language_id": "xx"})
    assert status == 400 and b"Unsupported language" in data

    status, _, _ = _req(server, "POST", "/other")
    assert status == 404


def test_concurrent_requests_batch(server, service):
    """Two concurrent posts should ride one micro-batch."""
    before = service.counters()["requests_total"]
    results = [None, None]

    def hit(i):
        results[i] = _req(server, "POST", "/v1/audio/speech", {
            "input": "abc." if i else "xyz.", "response_format": "wav",
            "max_tokens": 8, "diffusion_steps": 2,
        })

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for status, ctype, data in results:
        assert status == 200 and data[:4] == b"RIFF"
    assert service.counters()["requests_total"] == before + 2


def test_language_resolution(service):
    # explicit beats voice beats text
    r = parse_tts_request({"input": "hello", "language_id": "en"})
    assert service.resolve_language(r) == "en"
    r = parse_tts_request({"input": "hello", "voice": "en"})
    assert service.resolve_language(r) == "en"
    r = parse_tts_request({"input": "hello world"})
    assert service.resolve_language(r) == "en"


def test_speed_changes_duration(server):
    """OpenAI-compat `speed`: speed=2 halves output duration (WSOLA time
    stretch; the reference accepts the field but ignores it,
    reference api_server.py:41)."""
    body = {"input": "hello there.", "response_format": "pcm",
            "max_tokens": 48, "diffusion_steps": 2, "temperature": 0.0}
    status, _, normal = _req(server, "POST", "/v1/audio/speech", body)
    assert status == 200
    status, _, fast = _req(server, "POST", "/v1/audio/speech",
                           {**body, "speed": 2.0})
    assert status == 200
    assert len(normal) > 0
    ratio = len(fast) / len(normal)
    assert 0.4 < ratio < 0.62, f"speed=2 should halve duration, ratio={ratio}"
