from chatterbox_vllm2_tpu.models.s3gen.mel import mel_filterbank as _mel


def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None):
    return _mel(sr, n_fft, n_mels, fmin, fmax if fmax is not None else sr / 2)
