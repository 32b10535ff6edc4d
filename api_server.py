#!/usr/bin/env python3
"""OpenAI-compatible TTS API server — TPU-native chatterbox_vllm2_tpu.

Behavior-compatible with the reference `api_server.py` (same routes, request
schema, voice presets, language resolution, output formats) but backed by our
own engine with cross-request micro-batching.  Configuration is env-driven:

  CHATTERBOX_HOST / CHATTERBOX_PORT          bind address (default 0.0.0.0:8000)
  CHATTERBOX_CKPT_DIR                        checkpoint dir (safetensors layout)
  CHATTERBOX_MAX_BATCH_SIZE / _MAX_MODEL_LEN engine geometry
  CHATTERBOX_QUANT_MODE                      none | int8 | int4_awq
  CHATTERBOX_KV_CACHE_DTYPE                  bfloat16 | int8
  CHATTERBOX_VOICE_DIR / _VOICE_WAV          voice preset reference wavs
"""

from chatterbox_vllm2_tpu.server import main

if __name__ == "__main__":
    main()
