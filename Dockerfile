# Chatterbox TTS, TPU-native — serving image for Cloud TPU VMs.
#
# TPU analog of the reference's CUDA image (reference Dockerfile:1-48):
# instead of a CUDA runtime base, we install jax[tpu] + libtpu and expect to
# run ON a TPU VM (v5e/v6e) with the accelerator devices passed through.
#
# Build: docker build -t chatterbox-tts-tpu .
# Run (on a TPU VM):
#   docker run --privileged --net=host \
#     -e CHATTERBOX_QUANT_MODE=int8 \
#     -v ~/.cache/huggingface:/root/.cache/huggingface \
#     chatterbox-tts-tpu
#
# `--privileged --net=host` grants the container the TPU chips
# (/dev/accel*) and the fast host network path; on GKE use the TPU device
# plugin + `google.com/tpu` resource requests instead.

FROM python:3.12-slim-bookworm

ENV DEBIAN_FRONTEND=noninteractive \
    PIP_NO_CACHE_DIR=1

RUN apt-get update && apt-get install -y --no-install-recommends \
    curl g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# JAX with the TPU runtime (libtpu comes through the jax[tpu] extra).
COPY pyproject.toml .
RUN pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install numpy tokenizers safetensors huggingface_hub

COPY . .
RUN pip install -e . --no-deps \
    # build the native block allocator ahead of first request
    && python -c "from chatterbox_vllm2_tpu.native import make_block_allocator; make_block_allocator(8, 2, 4)"

EXPOSE 8000

# Serving defaults — the TPU analog of the reference's VRAM-tier envs
# (reference Dockerfile:37-42).  Override per HBM tier with
# start-api-server.sh or compose.
ENV CHATTERBOX_MODEL=multilingual \
    CHATTERBOX_MAX_BATCH_SIZE=8 \
    CHATTERBOX_MAX_MODEL_LEN=1024 \
    CHATTERBOX_QUANT_MODE=int8 \
    CHATTERBOX_ENGINE=continuous \
    CHATTERBOX_HOST=0.0.0.0 \
    CHATTERBOX_PORT=8000 \
    CHATTERBOX_XLA_CACHE=/var/cache/chatterbox/xla

# Persistent XLA compile cache across restarts (first compile of the decode
# program is minutes; warm starts are seconds).
VOLUME /var/cache/chatterbox

HEALTHCHECK --interval=30s --timeout=10s --start-period=300s --retries=3 \
    CMD curl -f http://localhost:${CHATTERBOX_PORT}/health || exit 1

CMD ["python", "-m", "chatterbox_vllm2_tpu.server.http"]
