import torch.nn as nn

LoRACompatibleLinear = nn.Linear
