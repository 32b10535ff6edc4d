"""Stdlib HTTP transport for the OpenAI-compatible TTS API.

Route-for-route parity with the reference FastAPI app (`api_server.py`):
  GET  /                 — API info + supported languages (`:184-197`)
  GET  /health           — liveness + device memory (`:200-208`)
  GET  /v1/models        — OpenAI model list (`:211-228`)
  POST /v1/audio/speech  — synthesis (`:231-338`)
plus GET /metrics (structured counters; the reference only has prints,
SURVEY.md §5.5).  Threaded server: each connection gets a thread, all
synthesis funnels through the TTSService micro-batching queue.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .schema import ValidationError, parse_tts_request
from .service import TTSService


def _json_bytes(obj) -> bytes:
    return json.dumps(obj).encode("utf-8")


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "chatterbox-vllm2-tpu"
    # set by create_server
    service: Optional[TTSService] = None
    model_type = "multilingual"
    quiet = False
    # default synthesis deadline; a wedged engine returns 504 instead of
    # pinning handler threads forever (CHATTERBOX_REQUEST_TIMEOUT_S)
    synthesis_timeout_s: float = 600.0

    def log_message(self, fmt, *args):
        if not self.quiet:
            super().log_message(fmt, *args)

    # -------------------------------------------------------------- #
    def _send(self, code: int, body: bytes, content_type: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj) -> None:
        self._send(code, _json_bytes(obj), "application/json")

    def _error(self, code: int, detail: str) -> None:
        # FastAPI's HTTPException wire format: {"detail": ...}
        self._send_json(code, {"detail": detail})

    # -------------------------------------------------------------- #
    def do_GET(self) -> None:
        svc = self.service
        if self.path == "/":
            langs = (list(svc.model.get_supported_languages().keys())
                     if svc else [])
            self._send_json(200, {
                "message": "Chatterbox TTS API Server (TPU)",
                "model_type": self.model_type,
                "supported_languages": langs,
                "endpoints": {"tts": "/v1/audio/speech", "health": "/health",
                              "models": "/v1/models", "metrics": "/metrics"},
            })
        elif self.path == "/health":
            mem_mb = 0.0
            try:
                import jax
                stats = jax.local_devices()[0].memory_stats() or {}
                mem_mb = stats.get("bytes_in_use", 0) / 1024**2
            except Exception:
                pass
            self._send_json(200, {
                "status": "healthy",
                "model_loaded": svc is not None,
                "model_type": self.model_type,
                "device_memory_mb": round(mem_mb, 2),
            })
        elif self.path == "/v1/models":
            self._send_json(200, {"object": "list", "data": [
                {"id": m, "object": "model", "created": 1700000000,
                 "owned_by": "chatterbox-vllm2-tpu"}
                for m in ("tts-1", "tts-1-hd")]})
        elif self.path == "/metrics":
            if svc is None:
                self._error(503, "Model not loaded")
                return
            lines = [f"chatterbox_{k} {v}" for k, v in svc.counters().items()]
            self._send(200, ("\n".join(lines) + "\n").encode(),
                       "text/plain; version=0.0.4")
        else:
            self._error(404, "Not Found")

    # Reject bodies past this size before buffering them (the reference caps
    # input at 4096 chars via pydantic, `api_server.py:34`; this guards the
    # transport itself).
    max_body_bytes = 1 << 20

    def _drain_body(self) -> None:
        """Consume any unread request body so HTTP/1.1 keep-alive connections
        don't parse leftover bytes as the next request line."""
        try:
            length = int(self.headers.get("Content-Length", 0))
        except ValueError:
            length = 0
        remaining = min(length, self.max_body_bytes)
        while remaining > 0:
            chunk = self.rfile.read(min(remaining, 65536))
            if not chunk:
                break
            remaining -= len(chunk)

    def _stream_speech(self, req) -> None:
        """Chunked-transfer streaming: one audio chunk per sentence segment
        (pcm raw samples / mp3 frames — both concatenate losslessly).  The
        first chunk leaves at first-sentence latency while later segments
        are still decoding in the engine batch."""
        from ..frontend.audio import FORMAT_CONTENT_TYPES

        gen = self.service.synthesize_stream(
            req, timeout=self.synthesis_timeout_s)
        headers_sent = False
        try:
            for chunk, media_type in gen:
                if not chunk:
                    continue
                if not headers_sent:
                    self.send_response(200)
                    self.send_header("Content-Type", media_type)
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    headers_sent = True
                self.wfile.write(f"{len(chunk):x}\r\n".encode())
                self.wfile.write(chunk)
                self.wfile.write(b"\r\n")
                self.wfile.flush()
            if not headers_sent:      # empty synthesis: still a valid stream
                self.send_response(200)
                self.send_header("Content-Type",
                                 FORMAT_CONTENT_TYPES.get(
                                     req.response_format, "audio/pcm"))
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()
        except (ValidationError, ValueError) as e:
            if not headers_sent:
                self._error(400, str(e))
            else:
                self.close_connection = True
        except TimeoutError as e:
            if not headers_sent:
                self._error(504, str(e))
            else:
                self.close_connection = True
        except Exception as e:
            if not headers_sent:
                self._error(500, f"Failed to generate speech: {e}")
            else:                     # mid-stream failure: truncate
                self.close_connection = True

    def do_POST(self) -> None:
        if self.path != "/v1/audio/speech":
            self._drain_body()
            self._error(404, "Not Found")
            return
        if self.service is None:
            self._drain_body()
            self._error(503, "Model not loaded")
            return
        try:
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._error(400, "invalid Content-Length")
                self.close_connection = True
                return
            if length > self.max_body_bytes:
                self._error(413, "request body too large")
                self.close_connection = True
                return
            raw = self.rfile.read(length)
            try:
                body = json.loads(raw or b"{}")
            except json.JSONDecodeError:
                self._error(400, "request body must be valid JSON")
                return
            req = parse_tts_request(body)
            if req.stream:
                self._stream_speech(req)
                return
            audio, media_type, _metrics = self.service.synthesize(
                req, timeout=self.synthesis_timeout_s)
            self._send(200, audio, media_type)
        except (ValidationError, ValueError) as e:
            self._error(400, str(e))
        except TimeoutError as e:
            self._error(504, str(e))
        except Exception as e:
            self._error(500, f"Failed to generate speech: {e}")


def create_server(service: TTSService, host: str = "0.0.0.0",
                  port: int = 8000, *, model_type: str = "multilingual",
                  quiet: bool = False,
                  synthesis_timeout_s: Optional[float] = None) -> ThreadingHTTPServer:
    if synthesis_timeout_s is None:
        synthesis_timeout_s = float(
            os.environ.get("CHATTERBOX_REQUEST_TIMEOUT_S", 600.0))
    handler = type("Handler", (_Handler,), {
        "service": service, "model_type": model_type, "quiet": quiet,
        "synthesis_timeout_s": synthesis_timeout_s})
    return ThreadingHTTPServer((host, port), handler)


def serve_in_thread(service: TTSService, host: str = "127.0.0.1",
                    port: int = 0, **kw) -> tuple[ThreadingHTTPServer, int]:
    """Start on a background thread (tests); returns (server, bound port)."""
    srv = create_server(service, host, port, **kw)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def main() -> None:
    """Env-driven entry point (reference `api_server.py:114-158,341-353`)."""
    from ..config import Config
    from ..parallel import initialize as init_distributed
    from ..tts import ChatterboxTTS
    from ..utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    init_distributed()   # no-op single-host; jax.distributed on pod slices

    host = os.environ.get("CHATTERBOX_HOST", "0.0.0.0")
    port = int(os.environ.get("CHATTERBOX_PORT", "8000"))
    ckpt_dir = os.environ.get("CHATTERBOX_CKPT_DIR")

    config = Config.from_env()
    if ckpt_dir:
        model = ChatterboxTTS.from_local(ckpt_dir, config=config)
    else:
        print("[WARNING] CHATTERBOX_CKPT_DIR not set — serving RANDOM weights"
              " (smoke-test mode)")
        model = ChatterboxTTS.from_random(config)
        vocab = os.environ.get("CHATTERBOX_VOCAB_JSON")
        if vocab:
            from ..frontend.tokenizer import SpeechTextTokenizer

            model.tokenizer = SpeechTextTokenizer(vocab)
        if model.tokenizer is None:
            raise SystemExit("random mode still needs a vocab: set "
                             "CHATTERBOX_VOCAB_JSON or CHATTERBOX_CKPT_DIR")

    service = TTSService(model)
    srv = create_server(service, host, port)
    langs = ", ".join(model.get_supported_languages())
    print(f"[INFO] Chatterbox TTS (TPU) serving on {host}:{port} — "
          f"languages: {langs}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.shutdown()
        srv.server_close()


if __name__ == "__main__":
    main()
