"""Upsample conformer encoder: 25 Hz speech tokens -> 50 Hz mel-rate features.

Structure (reference `transformer/upsample_encoder.py:99-318`):
  embed (linear 512->512 + LayerNorm, ESPnet rel-pos scaling x*sqrt(d))
  PreLookaheadLayer (3-token lookahead conv + causal conv, residual)
  6 conformer blocks (rel-pos self-attention + FFN, pre-norm, eps 1e-12)
  Upsample1D (nearest 2x, left-pad 4, conv k5)
  up_embed (second linear+LN input layer)
  4 more conformer blocks
  final LayerNorm

The ESPnet Transformer-XL relative attention (`transformer/attention.py:200-330`)
is implemented without the rel-shift trick: we compute q_v @ P^T over the
2T-1 centered positional table and gather with index k = T-1 - i + j, which
is algebraically identical to the reference's pad/reshape shift and maps to
one matmul + one gather on TPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...config import ConformerConfig
from .layers import (
    conv1d,
    init_conv1d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


# ---------------------------------------------------------------------------
# positional encoding
# ---------------------------------------------------------------------------


def espnet_rel_pos_table(d_model: int, max_len: int) -> np.ndarray:
    """Centered table [2*max_len-1, d] ordered from relative distance
    +(max_len-1) down to -(max_len-1) (reference `embedding.py:224-254`)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((max_len, d_model), np.float32)
    pe_pos[:, 0::2] = np.sin(position * div)
    pe_pos[:, 1::2] = np.cos(position * div)
    pe_neg = np.zeros((max_len, d_model), np.float32)
    pe_neg[:, 0::2] = np.sin(-position * div)
    pe_neg[:, 1::2] = np.cos(-position * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)


def rel_pos_slice(table: jnp.ndarray, max_len: int, T: int) -> jnp.ndarray:
    """[2T-1, d] slice for sequence length T (reference `embedding.py:272-294`)."""
    center = max_len - 1
    return jax.lax.dynamic_slice_in_dim(table, center - T + 1, 2 * T - 1, axis=0)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def init_rel_attn(key, d_model, heads, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8))
    d_k = d_model // heads
    bound = (6.0 / (heads + d_k)) ** 0.5  # xavier_uniform on [h, d_k]
    return {
        "q": init_linear(next(keys), d_model, d_model, dtype),
        "k": init_linear(next(keys), d_model, d_model, dtype),
        "v": init_linear(next(keys), d_model, d_model, dtype),
        "out": init_linear(next(keys), d_model, d_model, dtype),
        "pos": init_linear(next(keys), d_model, d_model, dtype, bias=False),
        "pos_bias_u": jax.random.uniform(next(keys), (heads, d_k), jnp.float32,
                                         -bound, bound).astype(dtype),
        "pos_bias_v": jax.random.uniform(next(keys), (heads, d_k), jnp.float32,
                                         -bound, bound).astype(dtype),
    }


def rel_attn_apply(p, x, pos_emb, heads, mask_bias=None):
    """Rel-pos multi-head self-attention.

    x: [B, T, d]; pos_emb: [2T-1, d]; mask_bias: [B, 1, 1, T] additive or None.
    """
    B, T, d = x.shape
    d_k = d // heads
    q = linear(p["q"], x).reshape(B, T, heads, d_k)
    k = linear(p["k"], x).reshape(B, T, heads, d_k)
    v = linear(p["v"], x).reshape(B, T, heads, d_k)
    pe = linear(p["pos"], pos_emb).reshape(2 * T - 1, heads, d_k)

    qu = q + p["pos_bias_u"][None, None]
    qv = q + p["pos_bias_v"][None, None]

    ac = jnp.einsum("bqhd,bkhd->bhqk", qu, k, preferred_element_type=jnp.float32)
    bd_full = jnp.einsum("bqhd,phd->bhqp", qv, pe, preferred_element_type=jnp.float32)
    # gather relative position r = i - j at table index T-1 - i + j
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    idx = T - 1 - i + j                                  # [T, T]
    bd = bd_full[:, :, jnp.arange(T)[:, None], idx]      # [B, h, T, T]
    scores = (ac + bd) * (d_k ** -0.5)
    if mask_bias is not None:
        scores = scores + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, d)
    return linear(p["out"], out)


def init_conformer_layer(key, d_model, heads, ff_dim, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4))
    return {
        "norm_mha": init_layer_norm(d_model, dtype),
        "attn": init_rel_attn(next(keys), d_model, heads, dtype),
        "norm_ff": init_layer_norm(d_model, dtype),
        "ff_w1": init_linear(next(keys), d_model, ff_dim, dtype),
        "ff_w2": init_linear(next(keys), ff_dim, d_model, dtype),
    }


def conformer_layer_apply(p, x, pos_emb, heads, mask_bias=None):
    """Pre-norm attention + swish FFN (reference `encoder_layer.py:190-236`,
    macaron/conv disabled per the S3Gen config; norm eps 1e-12)."""
    y = layer_norm(p["norm_mha"], x, eps=1e-12)
    x = x + rel_attn_apply(p["attn"], y, pos_emb, heads, mask_bias)
    y = layer_norm(p["norm_ff"], x, eps=1e-12)
    y = linear(p["ff_w2"], jax.nn.silu(linear(p["ff_w1"], y)))
    return x + y


def init_pre_lookahead(key, channels, lookahead, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv1d(k1, channels, channels, lookahead + 1, dtype),
        "conv2": init_conv1d(k2, channels, channels, 3, dtype),
    }


def pre_lookahead_apply(p, x, lookahead):
    """x: [B, T, C] (reference `upsample_encoder.py:66-96`)."""
    y = x.transpose(0, 2, 1)
    y = conv1d(p["conv1"], y, padding=(0, lookahead))
    y = jax.nn.leaky_relu(y, 0.01)
    y = conv1d(p["conv2"], y, padding=(2, 0))
    return x + y.transpose(0, 2, 1)


def init_upsample1d(key, channels, stride, dtype=jnp.float32):
    return {"conv": init_conv1d(key, channels, channels, stride * 2 + 1, dtype)}


def upsample1d_apply(p, x, stride):
    """Nearest 2x + left-pad + conv (reference `upsample_encoder.py:37-63`).
    x: [B, C, T] -> [B, C, T*stride]."""
    y = jnp.repeat(x, stride, axis=-1)
    y = jnp.pad(y, ((0, 0), (0, 0), (stride * 2, 0)))
    return conv1d(p["conv"], y)


# ---------------------------------------------------------------------------
# full encoder
# ---------------------------------------------------------------------------


def init_upsample_encoder(key, cfg: ConformerConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 32))
    d = cfg.output_size
    return {
        "embed": {"linear": init_linear(next(keys), cfg.input_size, d, dtype),
                  "norm": init_layer_norm(d, dtype)},
        "pre_lookahead": init_pre_lookahead(next(keys), d, cfg.pre_lookahead_len, dtype),
        "encoders": [
            init_conformer_layer(next(keys), d, cfg.attention_heads,
                                 cfg.linear_units, dtype)
            for _ in range(cfg.num_blocks)
        ],
        "up_layer": init_upsample1d(next(keys), d, cfg.upsample_stride, dtype),
        "up_embed": {"linear": init_linear(next(keys), cfg.input_size, d, dtype),
                     "norm": init_layer_norm(d, dtype)},
        "up_encoders": [
            init_conformer_layer(next(keys), d, cfg.attention_heads,
                                 cfg.linear_units, dtype)
            for _ in range(cfg.num_up_blocks)
        ],
        "after_norm": init_layer_norm(d, dtype),
    }


def upsample_encoder_apply(
    params: dict,
    cfg: ConformerConfig,
    x: jnp.ndarray,               # [B, T, input_size] token embeddings
    mask: jnp.ndarray | None = None,   # [B, T] bool, True = valid
    *,
    pos_table: jnp.ndarray,       # espnet_rel_pos_table for >= 2*T_up
    pos_table_len: int,
) -> jnp.ndarray:
    """Returns [B, T*stride, output_size]."""
    B, T, _ = x.shape
    d = cfg.output_size
    xscale = math.sqrt(d)

    def embed(p, x):
        y = layer_norm(p["norm"], linear(p["linear"], x), eps=1e-5)
        return y * xscale

    bias = None
    if mask is not None:
        bias = jnp.where(mask, 0.0, -1e10).astype(jnp.float32)[:, None, None, :]

    y = embed(params["embed"], x)
    pos = rel_pos_slice(pos_table, pos_table_len, T)
    y = pre_lookahead_apply(params["pre_lookahead"], y, cfg.pre_lookahead_len)
    for lp in params["encoders"]:
        y = conformer_layer_apply(lp, y, pos, cfg.attention_heads, bias)

    y = upsample1d_apply(params["up_layer"], y.transpose(0, 2, 1),
                         cfg.upsample_stride).transpose(0, 2, 1)
    T2 = T * cfg.upsample_stride
    bias2 = None
    if mask is not None:
        mask2 = jnp.repeat(mask, cfg.upsample_stride, axis=-1)
        bias2 = jnp.where(mask2, 0.0, -1e10).astype(jnp.float32)[:, None, None, :]
    y = embed(params["up_embed"], y)
    pos2 = rel_pos_slice(pos_table, pos_table_len, T2)
    for lp in params["up_encoders"]:
        y = conformer_layer_apply(lp, y, pos2, cfg.attention_heads, bias2)

    return layer_norm(params["after_norm"], y, eps=1e-5)
