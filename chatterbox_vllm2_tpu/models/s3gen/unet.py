"""Causal 1-D U-Net — the CFM velocity estimator.

Geometry (reference `decoder.py:100-217` with the S3Gen config
`s3gen.py:76-87`: in 320ch, channels=[256], causal, 4 transformer blocks per
resnet, 12 mid blocks):

  down:  1 x [CausalResnet(320->256) + 4 x Transformer(256, 8h x 64) + CausalConv k3]
  mid:  12 x [CausalResnet(256->256) + 4 x Transformer]
  up:    1 x [CausalResnet(512->256, skip concat) + 4 x Transformer + CausalConv k3]
  final: CausalBlock(256) + Conv1d(256->80, k1)

"Causal" applies to the convolutions (left padding); attention is full
bidirectional (the reference builds a pure padding mask, `decoder.py:269`).
Time conditioning: sinusoidal(320) -> SiLU MLP (320->1024->1024), injected
into each resnet between its two conv blocks.  The transformer blocks are
diffusers-style: LN -> MHA(inner 512) -> LN -> GELU-MLP(x4).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...config import UNetConfig
from .layers import (
    conv1d,
    init_conv1d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    mha,
    mish,
)


def sinusoidal_time_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """[B] -> [B, dim] (reference `matcha/decoder.py:14-29`)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    args = scale * t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


# -- causal conv blocks ------------------------------------------------------


def init_causal_block(key, c_in, c_out, dtype=jnp.float32):
    return {
        "conv": init_conv1d(key, c_in, c_out, 3, dtype),
        "norm": init_layer_norm(c_out, dtype),
    }


def causal_block_apply(p, x, mask):
    """CausalConv1d(k3) -> LayerNorm over channels -> Mish
    (reference `decoder.py:48-61`). x: [B, C, T]; mask: [B, 1, T]."""
    y = conv1d(p["conv"], x * mask, padding=(2, 0))
    y = layer_norm(p["norm"], y.transpose(0, 2, 1)).transpose(0, 2, 1)
    return mish(y) * mask


def init_causal_resnet(key, c_in, c_out, time_dim, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4))
    return {
        "mlp": init_linear(next(keys), time_dim, c_out, dtype),
        "block1": init_causal_block(next(keys), c_in, c_out, dtype),
        "block2": init_causal_block(next(keys), c_out, c_out, dtype),
        "res_conv": init_conv1d(next(keys), c_in, c_out, 1, dtype),
    }


def causal_resnet_apply(p, x, mask, t_emb):
    """reference `matcha/decoder.py:46-61` with causal blocks."""
    h = causal_block_apply(p["block1"], x, mask)
    h = h + linear(p["mlp"], mish(t_emb))[:, :, None]
    h = causal_block_apply(p["block2"], h, mask)
    return h + conv1d(p["res_conv"], x * mask)


# -- transformer block -------------------------------------------------------


def init_transformer_block(key, dim, heads, head_dim, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8))
    inner = heads * head_dim
    return {
        "norm1": init_layer_norm(dim, dtype),
        "to_q": init_linear(next(keys), dim, inner, dtype, bias=False),
        "to_k": init_linear(next(keys), dim, inner, dtype, bias=False),
        "to_v": init_linear(next(keys), dim, inner, dtype, bias=False),
        "to_out": init_linear(next(keys), inner, dim, dtype),
        "norm3": init_layer_norm(dim, dtype),
        "ff_in": init_linear(next(keys), dim, dim * 4, dtype),
        "ff_out": init_linear(next(keys), dim * 4, dim, dtype),
    }


def transformer_block_apply(p, x, heads, mask_bias=None):
    """x: [B, T, C] (reference `matcha/transformer.py:243-316`, layer-norm path)."""
    y = layer_norm(p["norm1"], x)
    attn = mha(linear(p["to_q"], y), linear(p["to_k"], y), linear(p["to_v"], y),
               heads, bias=mask_bias)
    x = x + linear(p["to_out"], attn)
    y = layer_norm(p["norm3"], x)
    y = linear(p["ff_out"], jax.nn.gelu(linear(p["ff_in"], y), approximate=False))
    return x + y


# -- full U-Net --------------------------------------------------------------


def init_unet(key, cfg: UNetConfig, dtype=jnp.float32) -> dict:
    # each down/mid/up stage consumes 5 keys (resnet + 4 transformer blocks)
    keys = iter(jax.random.split(key, 5 * (cfg.num_mid_blocks + 2) + 8))
    ch = cfg.channels
    time_dim = ch * 4

    def res_and_tfs(c_in):
        return {
            "resnet": init_causal_resnet(next(keys), c_in, ch, time_dim, dtype),
            "transformers": [
                init_transformer_block(next(keys), ch, cfg.num_heads,
                                       cfg.head_dim, dtype)
                for _ in range(4)
            ],
        }

    return {
        "time_mlp": {
            "linear1": init_linear(next(keys), cfg.in_channels, time_dim, dtype),
            "linear2": init_linear(next(keys), time_dim, time_dim, dtype),
        },
        "down": {**res_and_tfs(cfg.in_channels),
                 "downsample": init_conv1d(next(keys), ch, ch, 3, dtype)},
        "mid": [res_and_tfs(ch) for _ in range(cfg.num_mid_blocks)],
        "up": {**res_and_tfs(ch * 2),
               "upsample": init_conv1d(next(keys), ch, ch, 3, dtype)},
        "final_block": init_causal_block(next(keys), ch, ch, dtype),
        "final_proj": init_conv1d(next(keys), ch, cfg.out_channels, 1, dtype),
    }


def unet_apply(
    params: dict,
    cfg: UNetConfig,
    x: jnp.ndarray,        # [B, 80, T] noisy sample
    mu: jnp.ndarray,       # [B, 80, T] encoder output
    t: jnp.ndarray,        # [B] flow time
    spks: jnp.ndarray,     # [B, 80] projected x-vector
    cond: jnp.ndarray,     # [B, 80, T] prompt-mel conditioning
    mask: jnp.ndarray | None = None,    # [B, 1, T] float, 1 = valid
) -> jnp.ndarray:
    B, _, T = x.shape
    if mask is None:
        mask = jnp.ones((B, 1, T), x.dtype)
    mask_bias = None
    if mask is not None:
        mask_bias = jnp.where(mask[:, :, None, :] > 0, 0.0, -1e10).astype(jnp.float32)

    t_emb = sinusoidal_time_emb(t, cfg.in_channels).astype(x.dtype)
    t_emb = linear(params["time_mlp"]["linear2"],
                   jax.nn.silu(linear(params["time_mlp"]["linear1"], t_emb)))

    spks_t = jnp.broadcast_to(spks[:, :, None], (B, spks.shape[1], T))
    h = jnp.concatenate([x, mu, spks_t, cond], axis=1)      # [B, 320, T]

    def stage(p, h):
        h = causal_resnet_apply(p["resnet"], h, mask, t_emb)
        y = h.transpose(0, 2, 1)
        for tp in p["transformers"]:
            y = transformer_block_apply(tp, y, cfg.num_heads, mask_bias)
        return y.transpose(0, 2, 1)

    h = stage(params["down"], h)
    skip = h
    h = conv1d(params["down"]["downsample"], h * mask, padding=(2, 0))

    for p in params["mid"]:
        h = stage(p, h)

    h = jnp.concatenate([h, skip], axis=1)                  # [B, 512, T]
    h = stage(params["up"], h)
    h = conv1d(params["up"]["upsample"], h * mask, padding=(2, 0))

    h = causal_block_apply(params["final_block"], h, mask)
    out = conv1d(params["final_proj"], h * mask)
    return out * mask
