"""Faithful stand-in for diffusers.models.attention_processor.Attention for
the configuration the reference uses (self-attention, scale = dim_head^-0.5,
inner = heads * dim_head, to_q/k/v bias-free, to_out[0] Linear with bias)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class Attention(nn.Module):
    def __init__(self, query_dim, heads=8, dim_head=64, dropout=0.0, bias=False,
                 cross_attention_dim=None, upcast_attention=False, **kwargs):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        kv_dim = cross_attention_dim or query_dim
        self.to_q = nn.Linear(query_dim, inner, bias=bias)
        self.to_k = nn.Linear(kv_dim, inner, bias=bias)
        self.to_v = nn.Linear(kv_dim, inner, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(dropout)])

    def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None):
        ctx = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
        B, Tq, _ = hidden_states.shape
        h = self.heads
        q = self.to_q(hidden_states).view(B, Tq, h, -1).transpose(1, 2)
        k = self.to_k(ctx).view(B, ctx.shape[1], h, -1).transpose(1, 2)
        v = self.to_v(ctx).view(B, ctx.shape[1], h, -1).transpose(1, 2)
        bias_ = None
        if attention_mask is not None:
            bias_ = attention_mask
            if bias_.dim() == 3:
                bias_ = bias_.unsqueeze(1)
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=bias_)
        out = out.transpose(1, 2).reshape(B, Tq, -1)
        return self.to_out[1](self.to_out[0](out))
