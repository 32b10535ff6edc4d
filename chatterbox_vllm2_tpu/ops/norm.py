"""Normalization ops.

RMSNorm matches the reference T3 backbone's fused-CUDA RMSNorm semantics
(vLLM `LlamaModel`, used via reference `models/t3/t3.py:268`): accumulate in
fp32, scale by learned weight, cast back to input dtype.  On TPU, XLA fuses
this into neighboring ops, so a Pallas kernel is unnecessary here.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)
