"""Import-only stub; the golden tests never instantiate the pip tokenizer."""

import torch.nn as nn


class ModelConfig:
    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class S3TokenizerV2(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    def quantize(self, *a, **k):
        raise NotImplementedError("s3tokenizer stub")
