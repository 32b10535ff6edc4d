from .s3tokenizer import (
    S3_SR,
    S3_TOKEN_RATE,
    SPEECH_VOCAB_SIZE,
    S3TokenizerModel,
    log_mel_spectrogram_128,
    init_s3tokenizer,
    s3tokenizer_quantize,
    convert_s3tokenizer,
    drop_invalid_tokens,
)
