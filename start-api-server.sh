#!/bin/bash
# Chatterbox TTS (TPU-native) — API server launcher with HBM-tier presets.
#
# TPU analog of the reference's VRAM-preset launcher
# (reference start-api-server.sh:96-147): presets map TPU HBM budgets to
# engine geometry + quantization instead of GPU VRAM tiers.

set -e

GREEN='\033[0;32m'; YELLOW='\033[1;33m'; RED='\033[0;31m'; NC='\033[0m'
info()  { echo -e "${GREEN}[INFO]${NC} $1"; }
warn()  { echo -e "${YELLOW}[WARNING]${NC} $1"; }
error() { echo -e "${RED}[ERROR]${NC} $1"; }

command -v python3 >/dev/null || { error "python3 not found"; exit 1; }

show_usage() {
    cat <<EOF
Usage: $0 [OPTIONS]

Start the Chatterbox TTS API server on the local TPU.

OPTIONS:
    --low-hbm        Small slices / shared chips: batch 4, len 800, INT4 AWQ
                     weights + INT8 KV pages (paged engine)
    --default        v5e (16 GB HBM): batch 8, len 1024, INT8 weights,
                     paged engine (reads only live pages: measured 6.2x the
                     dense cache at len-1024 serving, BENCH_NOTES.md)
    --throughput     v5e/v6e dedicated: batch 32, len 1024, INT8
                     weights, paged engine (measured 3030 tok/s at
                     serving lengths, 37% over batch 16, per-stream
                     still 3.8x realtime — BENCH_NOTES.md)
    --bf16           No quantization (debug / quality baseline)
    --mesh DxM       Shard serving over a (data, model) device mesh,
                     e.g. --mesh 2x4 on an 8-chip slice (continuous or
                     paged engine).  Multi-process pod slices additionally
                     serve host-local queues in lockstep (engine/multihost;
                     set CHATTERBOX_COORDINATOR / _NUM_PROCESSES /
                     _PROCESS_ID per host or rely on TPU pod metadata)
    --model NAME     'multilingual' (default) or 'english'
    --port PORT      Server port (default 8000)
    --host HOST      Bind host (default 0.0.0.0)
    --help           This message

EXAMPLES:
    $0                        # default v5e preset
    $0 --throughput --port 9000
EOF
}

# defaults (v5e 16 GB)
MODEL="multilingual"
MAX_BATCH_SIZE=8
MAX_MODEL_LEN=1024
QUANT_MODE="int8"
KV_DTYPE="bfloat16"
ENGINE="paged"
PORT=8000
HOST="0.0.0.0"

while [[ $# -gt 0 ]]; do
    case $1 in
        --low-hbm)
            MAX_BATCH_SIZE=4; MAX_MODEL_LEN=800
            QUANT_MODE="int4_awq"; KV_DTYPE="int8"; ENGINE="paged"
            info "Low-HBM: batch 4, len 800, INT4 weights, INT8 KV pages (paged engine)"
            shift ;;
        --default)
            shift ;;
        --throughput)
            MAX_BATCH_SIZE=32; MAX_MODEL_LEN=1024; QUANT_MODE="int8"
            ENGINE="paged"
            info "Throughput: batch 32, len 1024, INT8 weights, paged engine"
            shift ;;
        --bf16)
            QUANT_MODE="none"
            info "bf16: no quantization"
            shift ;;
        --mesh)  MESH="$2"; shift 2 ;;
        --model) MODEL="$2"; shift 2 ;;
        --port)  PORT="$2"; shift 2 ;;
        --host)  HOST="$2"; shift 2 ;;
        --help)  show_usage; exit 0 ;;
        *) error "Unknown option: $1"; show_usage; exit 1 ;;
    esac
done

info "Chatterbox TTS (TPU) — model=$MODEL batch=$MAX_BATCH_SIZE len=$MAX_MODEL_LEN quant=$QUANT_MODE engine=$ENGINE"
info "Serving on $HOST:$PORT"

export CHATTERBOX_MODEL="$MODEL"
export CHATTERBOX_MAX_BATCH_SIZE="$MAX_BATCH_SIZE"
export CHATTERBOX_MAX_MODEL_LEN="$MAX_MODEL_LEN"
export CHATTERBOX_QUANT_MODE="$QUANT_MODE"
export CHATTERBOX_KV_CACHE_DTYPE="$KV_DTYPE"
export CHATTERBOX_ENGINE="$ENGINE"
export CHATTERBOX_HOST="$HOST"
export CHATTERBOX_PORT="$PORT"
[[ -n "${MESH:-}" ]] && export CHATTERBOX_MESH="$MESH"

exec python3 -m chatterbox_vllm2_tpu.server.http
