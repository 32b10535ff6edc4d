import torch.nn as nn


def get_activation(name: str) -> nn.Module:
    return {"silu": nn.SiLU(), "gelu": nn.GELU(), "relu": nn.ReLU(),
            "mish": nn.Mish(), "swish": nn.SiLU()}[name]
