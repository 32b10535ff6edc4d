"""Single typed configuration tree for the whole framework.

The reference scatters configuration over env vars, constructor kwargs, and
shell presets (SURVEY.md §5.6; reference `api_server.py:120-137`,
`start-api-server.sh:96-126`).  Here everything lives in frozen dataclasses so
configs can be hashed for jit static args and validated once at startup.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# T3: the 520M Llama-style speech-token decoder
# (hyperparams per reference `t3-model*/config.json` and
#  `models/t3/modules/t3_config.py`)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RopeConfig:
    """Llama3-style scaled rotary embeddings (reference t3-model/config.json:21-28)."""

    theta: float = 500000.0
    factor: float = 8.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192


@dataclass(frozen=True)
class T3Config:
    """T3 decoder hyperparameters.

    Mirrors reference `models/t3/modules/t3_config.py:1-38` plus the backbone
    shape from `t3-model/config.json` (the reference lies hidden_size=2048 to
    vLLM and halves it back at model init, `models/t3/t3.py:258-263`; we have
    no such hack — hidden size is just 1024).
    """

    # text stream
    text_vocab_size: int = 704          # 2454 for multilingual
    start_text_token: int = 255
    stop_text_token: int = 0
    max_text_tokens: int = 2048

    # speech stream
    speech_vocab_size: int = 8194
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    max_speech_tokens: int = 4096

    # conditioning
    speaker_embed_size: int = 256
    cond_seq_len: int = 34              # 1 speaker + 32 perceiver + 1 emotion
    perceiver_queries: int = 32
    perceiver_heads: int = 4
    speech_cond_prompt_len: int = 150
    emotion_adv: bool = True

    # Llama backbone
    hidden_size: int = 1024
    num_layers: int = 30
    num_heads: int = 16
    num_kv_heads: int = 16
    head_dim: int = 64
    intermediate_size: int = 4096
    rms_norm_eps: float = 1e-5
    rope: RopeConfig = field(default_factory=RopeConfig)

    @property
    def is_multilingual(self) -> bool:
        return self.text_vocab_size > 704

    @property
    def speech_vocab_padded(self) -> int:
        """LM-head vocab padded to a 256 multiple so the vocab-parallel shard
        divides evenly (the analog of vLLM ParallelLMHead padding)."""
        return ((self.speech_vocab_size + 255) // 256) * 256

    @classmethod
    def english(cls) -> "T3Config":
        return cls(text_vocab_size=704)

    @classmethod
    def multilingual(cls) -> "T3Config":
        return cls(text_vocab_size=2454)

    @classmethod
    def tiny(cls) -> "T3Config":
        """A tiny random-weight config for engine/unit tests (CPU-fast)."""
        return cls(
            text_vocab_size=96,
            speech_vocab_size=128,
            start_speech_token=120,
            stop_speech_token=121,
            max_text_tokens=64,
            max_speech_tokens=64,
            speech_cond_prompt_len=16,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            num_kv_heads=4,
            head_dim=16,
            intermediate_size=128,
        )


# ---------------------------------------------------------------------------
# S3Gen: token -> mel (conformer + flow matching) -> wav (HiFT)
# (hyperparams per reference `models/s3gen/s3gen.py:59-100` and friends)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ConformerConfig:
    """Upsample conformer encoder (reference `transformer/upsample_encoder.py:99-160`)."""

    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6          # pre-upsample blocks
    num_up_blocks: int = 4       # post-upsample blocks
    dropout_rate: float = 0.1
    input_size: int = 512
    pre_lookahead_len: int = 3
    upsample_stride: int = 2


@dataclass(frozen=True)
class CfmConfig:
    """Conditional flow matching solver (reference `flow_matching.py:21-28,198-226`)."""

    sigma_min: float = 1e-6
    t_scheduler: str = "cosine"
    inference_cfg_rate: float = 0.7
    n_timesteps: int = 10


@dataclass(frozen=True)
class UNetConfig:
    """Causal CFM estimator U-Net (reference `decoder.py:100-170`)."""

    in_channels: int = 320       # 80 x + 80 mu + 80 spk + 80 cond
    out_channels: int = 80
    channels: int = 256
    num_mid_blocks: int = 12
    num_heads: int = 8
    head_dim: int = 64
    act_fn: str = "gelu"


@dataclass(frozen=True)
class HiftConfig:
    """HiFT NSF-iSTFT vocoder (reference `hifigan.py:286-340`)."""

    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: tuple = (8, 5, 3)
    upsample_kernel_sizes: tuple = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop_len: int = 4
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernel_sizes: tuple = (7, 7, 11)
    source_resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99


@dataclass(frozen=True)
class S3GenConfig:
    input_frame_rate: int = 25          # speech tokens/s
    token_mel_ratio: int = 2            # 25 tok/s -> 50 mel frames/s
    speech_vocab_size: int = 6561       # S3 tokenizer vocab
    spk_embed_dim: int = 192            # CAMPPlus x-vector
    mel_bins: int = 80
    sample_rate: int = 24000
    mel_hop: int = 480                  # 24 kHz mel: n_fft 1920, hop 480
    mel_n_fft: int = 1920
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0
    trim_fade_samples: int = 480        # 20 ms fade-in (reference s3gen.py:254-257)
    encoder: ConformerConfig = field(default_factory=ConformerConfig)
    cfm: CfmConfig = field(default_factory=CfmConfig)
    unet: UNetConfig = field(default_factory=UNetConfig)
    hift: HiftConfig = field(default_factory=HiftConfig)


# ---------------------------------------------------------------------------
# Conditioning encoders
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VoiceEncoderConfig:
    """RTVC speaker encoder (reference `models/voice_encoder/config.py:1-17`)."""

    num_mels: int = 40
    sample_rate: int = 16000
    speaker_embed_size: int = 256
    ve_hidden_size: int = 256
    num_layers: int = 3
    ve_partial_frames: int = 160
    ve_final_relu: bool = True
    stft_hop_ms: float = 10.0
    stft_win_ms: float = 25.0
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0


@dataclass(frozen=True)
class S3TokenizerConfig:
    """S3 v2 25 Hz speech tokenizer (reference `models/s3tokenizer/s3tokenizer.py:14-19`)."""

    sample_rate: int = 16000
    token_rate: int = 25
    vocab_size: int = 6561
    n_mels: int = 128
    n_fft: int = 400
    hop_length: int = 160
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 12
    fsq_levels: tuple = (3, 3, 3, 3, 3, 3, 3, 3)   # 3^8 = 6561
    fsq_dim: int = 8


@dataclass(frozen=True)
class CampPlusConfig:
    """CAMPPlus x-vector speaker embedding (reference `models/s3gen/xvector.py:340-428`)."""

    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128


# ---------------------------------------------------------------------------
# Engine / serving
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SamplingConfig:
    """Default sampling parameters (reference `tts.py:455-464`)."""

    temperature: float = 0.8
    top_p: float = 0.8
    min_p: float = 0.0
    repetition_penalty: float = 2.0
    max_tokens: int = 1000
    cfg_scale: float = 0.5              # per-request (reference is global-only)


@dataclass(frozen=True)
class EngineConfig:
    max_batch_size: int = 8             # CFG pairs; device batch = 2x this
    max_model_len: int = 1024           # cond(34) + text + 1 + speech tokens
    # text-length buckets; prefill is O(T^2) so long buckets cost what they
    # should.  Buckets that don't fit max_model_len are skipped at runtime.
    # 2048 matches the reference's max_text_tokens (t3_config.py:5).
    prefill_buckets: tuple = (64, 128, 256, 512, 1024, 2048)
    # Paged-KV page size (tokens).  Pages are pair-level [H, bs, 2*head_dim]
    # (ops/paged_attention.py).  128 keeps every DMA large and — required for
    # INT8 pages — makes the f32 scale rows [H, 128] exactly lane-aligned
    # (Mosaic rejects HBM slices whose minor dim isn't a 128 multiple).
    # Granularity waste is <= 127 tokens per request tail.
    kv_block_size: int = 128
    kv_cache_dtype: str = "bfloat16"    # or "int8" (paged engine)
    quant_mode: str = "none"            # none | int8 | int4_awq (T3 backbone)
    # quantize the audio-stack linears too (reference bnb swap for
    # S3Gen/voice-encoder/cond-enc, `quantization.py:80-139`, `tts.py:119-205`)
    quantize_s3gen: bool = False
    quantize_voice_encoder: bool = False
    decode_steps_per_dispatch: int = 32  # tokens generated per host round-trip
    # Occupancy buckets (CFG pairs) for the continuous engine's decode chunk:
    # when the active slots fit in a prefix of this size, the chunk runs on a
    # sliced sub-state so a lone request doesn't pay max_batch_size shapes
    # (batch-1 TTFA).  () disables.  Buckets > max_batch_size are ignored.
    pair_buckets: tuple = (1, 2, 4)
    enable_analyzer: bool = True        # in-loop alignment stream analyzer
    # engine flavor the pipeline/serving stack constructs:
    #   "dense"      — barrier micro-batches over the slotted cache (T3Engine)
    #   "continuous" — slot-level admission, requests join/leave mid-decode
    #   "paged"      — continuous + paged KV pool + Pallas paged attention
    engine_kind: str = "continuous"
    # "bucketed": decode attention reads grow in CACHE_LEN_BUCKET steps as the
    # batch lengthens (fastest steady state, but one compile per bucket
    # reached).  "single": one decode program per generate() sized for the
    # run's final length (one compile — what cold starts and benches want).
    cache_len_schedule: str = "bucketed"
    # "scan": backbone layers run as lax.scan over stacked params (one layer
    # body to compile — fast cold start through the slow axon compile path).
    # "unroll": static Python loop (bigger program, slightly faster step).
    layer_mode: str = "scan"
    # Paged-engine append strategy: "dus" writes each new token's K/V into
    # its page every step (per-pair dynamic_update_slice ops); "staged"
    # accumulates the chunk's tokens in a dense tail buffer (one scalar-
    # indexed DUS per layer per step) that the kernel reads as an extra
    # attention block, flushed to pages once per chunk.
    paged_append: str = "dus"
    # Decode attention implementation: "xla" (einsum over a per-layer cache
    # slice) or "pallas" (fused ops/dense_attention kernel reading the
    # stacked cache via a scalar-prefetched layer index).  "xla" measured
    # faster on the shared dev chip; "pallas" is the A/B candidate for
    # production TPUs and the INT8-KV path.  Ignored (forced "xla") when the
    # engine is mesh-sharded.
    decode_attn: str = "xla"


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh over (data, model) axes; model rides ICI, data spans DCN."""

    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


@dataclass(frozen=True)
class ServerConfig:
    host: str = "0.0.0.0"
    port: int = 4123
    max_input_chars: int = 4096
    default_voice: str = "alloy"


@dataclass(frozen=True)
class Config:
    t3: T3Config = field(default_factory=T3Config.multilingual)
    s3gen: S3GenConfig = field(default_factory=S3GenConfig)
    voice_encoder: VoiceEncoderConfig = field(default_factory=VoiceEncoderConfig)
    s3tokenizer: S3TokenizerConfig = field(default_factory=S3TokenizerConfig)
    campplus: CampPlusConfig = field(default_factory=CampPlusConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    server: ServerConfig = field(default_factory=ServerConfig)

    @classmethod
    def from_env(cls) -> "Config":
        """Build from CHATTERBOX_* env vars (behavior-compatible with the
        reference's env interface, `api_server.py:120-137`)."""
        model = os.environ.get("CHATTERBOX_MODEL", "multilingual")
        t3 = T3Config.multilingual() if model == "multilingual" else T3Config.english()
        eng = EngineConfig(
            max_batch_size=int(os.environ.get("CHATTERBOX_MAX_BATCH_SIZE", 8)),
            max_model_len=int(os.environ.get("CHATTERBOX_MAX_MODEL_LEN", 1024)),
            kv_cache_dtype=os.environ.get("CHATTERBOX_KV_CACHE_DTYPE", "bfloat16"),
            kv_block_size=int(os.environ.get("CHATTERBOX_KV_BLOCK_SIZE", 128)),
            quant_mode=os.environ.get("CHATTERBOX_QUANT_MODE", "none"),
            quantize_s3gen=os.environ.get(
                "CHATTERBOX_QUANTIZE_S3GEN", "").lower() in ("1", "true"),
            quantize_voice_encoder=os.environ.get(
                "CHATTERBOX_QUANTIZE_VOICE_ENCODER", "").lower() in ("1", "true"),
            engine_kind=os.environ.get("CHATTERBOX_ENGINE", "continuous"),
            decode_steps_per_dispatch=int(os.environ.get(
                "CHATTERBOX_DECODE_STEPS", 32)),
            paged_append=os.environ.get("CHATTERBOX_PAGED_APPEND", "dus"),
        )
        srv = ServerConfig(
            host=os.environ.get("CHATTERBOX_HOST", "0.0.0.0"),
            port=int(os.environ.get("CHATTERBOX_PORT", 4123)),
        )
        sampling = SamplingConfig(
            cfg_scale=float(os.environ.get("CHATTERBOX_CFG_SCALE", 0.5)),
        )
        # CHATTERBOX_MESH="2x4" -> (data=2, model=4); ChatterboxTTS shards
        # the serving engine over this mesh when num_devices > 1.
        mesh_env = os.environ.get("CHATTERBOX_MESH", "1x1")
        data, _, model = mesh_env.partition("x")
        mesh = MeshConfig(data=int(data or 1), model=int(model or 1))
        return cls(t3=t3, engine=eng, server=srv, sampling=sampling, mesh=mesh)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
