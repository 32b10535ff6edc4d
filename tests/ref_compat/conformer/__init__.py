"""Import-only stub; ConformerWrapper in the reference's vendored matcha code
references this class but the S3Gen config never instantiates it."""

import torch.nn as nn


class ConformerBlock(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
