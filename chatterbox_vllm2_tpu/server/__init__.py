"""OpenAI-compatible TTS serving layer (reference `api_server.py`).

Pure-stdlib HTTP stack: this image has no FastAPI/uvicorn, and a TTS server's
needs (4 routes, JSON in, bytes out) don't justify a framework.  The layer is
split the same way the reference is — schema (`TTSRequest` validation),
service (model + request queue), transport (HTTP routing) — but the service
adds cross-request micro-batching that the reference lacks (its async handler
calls the blocking `model.generate` directly, serializing all requests;
reference `api_server.py:269-276`).
"""

from .schema import TTSRequest, ValidationError, parse_tts_request
from .service import TTSService, VoiceRegistry
from .http import create_server, main

__all__ = [
    "TTSRequest", "ValidationError", "parse_tts_request",
    "TTSService", "VoiceRegistry", "create_server", "main",
]
