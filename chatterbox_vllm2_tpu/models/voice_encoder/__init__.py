from .voice_encoder import (
    VoiceEncoderConfig,
    init_voice_encoder,
    voice_encoder_forward,
    embeds_from_wavs,
    convert_voice_encoder,
)
