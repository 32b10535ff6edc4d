"""Request schema for `POST /v1/audio/speech`.

Mirrors the reference's pydantic `TTSRequest` (`api_server.py:27-49`): same
fields, defaults, and bounds, plus the extensions this engine supports
natively that the reference cannot offer per-request — `cfg_scale`
(reference: global env var only, `models/t3/t3.py:296`, `README.md:355`),
`top_p`, `repetition_penalty`, `max_tokens`, `diffusion_steps`, `seed`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Optional

RESPONSE_FORMATS = ("mp3", "opus", "aac", "flac", "wav", "pcm")


class ValidationError(ValueError):
    """Bad request body; maps to HTTP 400 like the reference's
    `HTTPException(status_code=400)` paths."""


@dataclass
class TTSRequest:
    input: str
    model: str = "tts-1"
    voice: str = "alloy"
    response_format: str = "mp3"
    speed: float = 1.0
    # Chatterbox extensions (reference api_server.py:44-49)
    exaggeration: float = 0.5
    temperature: float = 0.8
    language_id: Optional[str] = None
    # TPU-engine extensions (not available in the reference)
    cfg_scale: float = 0.5
    top_p: float = 1.0
    min_p: float = 0.05
    repetition_penalty: float = 2.0
    max_tokens: int = 1000
    diffusion_steps: int = 10
    seed: int = 0
    # stream=true: chunked-transfer response, one audio chunk per sentence
    # segment (pcm/mp3 only — frame/sample concatenative containers).  A
    # capability beyond the reference (its route is strictly one-shot).
    stream: bool = False


def _number(body: Mapping[str, Any], key: str, default: float,
            lo: float, hi: float) -> float:
    v = body.get(key, default)
    if v is None:
        return default
    if not isinstance(v, (int, float)) or isinstance(v, bool):
        raise ValidationError(f"'{key}' must be a number")
    if not (lo <= v <= hi):
        raise ValidationError(f"'{key}' must be in [{lo}, {hi}], got {v}")
    return float(v)


def parse_tts_request(body: Any) -> TTSRequest:
    if not isinstance(body, Mapping):
        raise ValidationError("request body must be a JSON object")

    text = body.get("input")
    if not isinstance(text, str) or not text.strip():
        raise ValidationError("Input text is required")
    if len(text) > 4096:  # reference api_server.py:34 (max_length=4096)
        raise ValidationError("'input' exceeds 4096 characters")

    fmt = body.get("response_format", "mp3")
    if fmt not in RESPONSE_FORMATS:
        raise ValidationError(
            f"'response_format' must be one of {', '.join(RESPONSE_FORMATS)}")

    voice = body.get("voice", "alloy")
    if not isinstance(voice, str):
        raise ValidationError("'voice' must be a string")
    language_id = body.get("language_id")
    if language_id is not None and not isinstance(language_id, str):
        raise ValidationError("'language_id' must be a string")
    stream = body.get("stream", False)
    if not isinstance(stream, bool):
        raise ValidationError("'stream' must be a boolean")
    if stream and fmt not in ("pcm", "mp3"):
        raise ValidationError(
            "'stream' requires response_format 'pcm' or 'mp3' "
            "(concatenative containers)")

    return TTSRequest(
        input=text,
        model=str(body.get("model", "tts-1")),
        voice=voice,
        response_format=fmt,
        speed=_number(body, "speed", 1.0, 0.25, 4.0),
        exaggeration=_number(body, "exaggeration", 0.5, 0.0, 2.0),
        temperature=_number(body, "temperature", 0.8, 0.0, 2.0),
        language_id=language_id,
        cfg_scale=_number(body, "cfg_scale", 0.5, 0.0, 10.0),
        top_p=_number(body, "top_p", 1.0, 0.0, 1.0),
        min_p=_number(body, "min_p", 0.05, 0.0, 1.0),
        repetition_penalty=_number(body, "repetition_penalty", 2.0, 0.0, 10.0),
        max_tokens=int(_number(body, "max_tokens", 1000, 1, 4096)),
        diffusion_steps=int(_number(body, "diffusion_steps", 10, 1, 100)),
        seed=int(_number(body, "seed", 0, 0, 2**31 - 1)),
        stream=stream,
    )
