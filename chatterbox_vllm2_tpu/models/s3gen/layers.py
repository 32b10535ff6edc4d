"""Shared JAX layer primitives for the audio stack.

Parameter convention: every layer is a dict of arrays; linear weights are
stored [in, out] (JAX matmul order), conv weights [out_ch, in_ch, k] (torch
order, transposed at apply time into XLA's expected layout).  Weight-norm
convs from the reference are folded (w = g * v / ||v||) at checkpoint
conversion, so inference sees plain convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.quant_matmul import QuantTensor, quant_einsum


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Dense or weight-quantized linear: `w` may be a QuantTensor (the
    analog of the reference's bitsandbytes nn.Linear swap for the audio
    stack, reference `quantization.py:80-139`)."""
    w = p["w"]
    y = quant_einsum(x, w) if isinstance(w, QuantTensor) else x @ w
    return y + p["b"] if "b" in p else y


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def conv1d(
    p: dict,
    x: jnp.ndarray,                 # [B, C_in, T]
    *,
    stride: int = 1,
    padding=(0, 0),                 # (left, right) explicit
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """torch.nn.Conv1d semantics with explicit asymmetric padding."""
    w = p["w"]                      # [C_out, C_in/groups, K]
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[tuple(padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def conv_transpose1d(
    p: dict,
    x: jnp.ndarray,                 # [B, C_in, T]
    *,
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d semantics: out = (T-1)*stride - 2*pad + K.

    Implemented as zero-insertion (lhs dilation) + flipped-kernel conv, which
    XLA lowers to an efficient strided conv on the MXU.
    """
    w = p["w"]                      # torch layout [C_in, C_out, K]
    k = w.shape[-1]
    w_flipped = jnp.flip(w, axis=-1).transpose(1, 0, 2)   # -> [C_out, C_in, K]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, w_flipped,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def snake(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Snake activation x + sin^2(a*x)/a with per-channel alpha
    (reference `hifigan.py:34-84`, alpha_logscale=False). x: [B, C, T]."""
    alpha = p["alpha"][None, :, None]
    return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


def _he_normal(key, shape, dtype, fan_in):
    std = (2.0 / fan_in) ** 0.5
    return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)


def init_linear(key, d_in, d_out, dtype=jnp.float32, bias=True):
    kw, kb = jax.random.split(key)
    bound = d_in ** -0.5
    p = {"w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound).astype(dtype)}
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound).astype(dtype)
    return p


def init_conv1d(key, c_in, c_out, k, dtype=jnp.float32, bias=True, groups: int = 1):
    kw, kb = jax.random.split(key)
    fan_in = c_in // groups * k
    bound = fan_in ** -0.5
    p = {"w": jax.random.uniform(kw, (c_out, c_in // groups, k), jnp.float32,
                                 -bound, bound).astype(dtype)}
    if bias:
        p["b"] = jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound).astype(dtype)
    return p


def init_conv_transpose1d(key, c_in, c_out, k, dtype=jnp.float32, bias=True):
    kw, kb = jax.random.split(key)
    fan_in = c_out * k  # torch uses in_channels of the transposed view
    bound = fan_in ** -0.5
    p = {"w": jax.random.uniform(kw, (c_in, c_out, k), jnp.float32,
                                 -bound, bound).astype(dtype)}
    if bias:
        p["b"] = jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound).astype(dtype)
    return p


def init_layer_norm(dim, dtype=jnp.float32):
    return {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def mha(
    q: jnp.ndarray,                 # [B, Tq, H*D]
    k: jnp.ndarray,                 # [B, Tk, H*D]
    v: jnp.ndarray,
    num_heads: int,
    bias: jnp.ndarray | None = None,   # [B, 1|H, Tq, Tk] additive (f32)
    scale: float | None = None,
) -> jnp.ndarray:
    B, Tq, HD = q.shape
    D = HD // num_heads
    scale = D ** -0.5 if scale is None else scale
    qh = q.reshape(B, Tq, num_heads, D)
    kh = k.reshape(B, -1, num_heads, D)
    vh = v.reshape(B, -1, num_heads, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(B, Tq, HD)


def pad_mask_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, T] bool (True = valid) -> additive bias [B, 1, 1, T]."""
    return jnp.where(mask, 0.0, -1e10).astype(dtype)[:, None, None, :]
