"""Import-only stub (reference s3gen.py uses ta.transforms.Resample, which the
golden tests never call)."""

import torch.nn as nn


class _Resample(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    def forward(self, x):
        raise NotImplementedError("torchaudio stub: Resample not available")


class transforms:  # noqa: N801
    Resample = _Resample
