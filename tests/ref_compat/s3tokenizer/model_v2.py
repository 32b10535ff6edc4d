"""Import-only stub; the golden tests never instantiate the pip tokenizer."""

import torch.nn as nn


class ModelConfig:
    # defaults mirror the pip package's v2 25 Hz config (the reference reads
    # config.n_mels for its mel filterbank, s3tokenizer.py:42)
    def __init__(self, n_mels=128, n_audio_state=1280, n_audio_head=20,
                 n_audio_layer=12, **kw):
        self.n_mels = n_mels
        self.n_audio_state = n_audio_state
        self.n_audio_head = n_audio_head
        self.n_audio_layer = n_audio_layer
        for k, v in kw.items():
            setattr(self, k, v)


class S3TokenizerV2(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    @property
    def device(self):
        import torch

        return torch.device("cpu")

    def quantize(self, *a, **k):
        raise NotImplementedError("s3tokenizer stub")
