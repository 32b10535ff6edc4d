"""Llama3-scaled rotary position embeddings.

The T3 backbone uses RoPE with theta=5e5 and llama3 wavelength-dependent
frequency scaling (reference `t3-model/config.json:21-28`; applied inside
vLLM's `LlamaModel` which the reference plugs into at `models/t3/t3.py:268`).
Convention is the HF/NeoX "rotate_half" split-halves layout.

We precompute a cos/sin table once per model and gather rows by position —
positions are exact per-token indices tracked by our engine (the reference's
engine supplies them as vLLM `positions`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import RopeConfig


def llama3_inv_freq(head_dim: int, cfg: RopeConfig) -> np.ndarray:
    """Frequency vector with llama3 low/high-wavelength scaling."""
    inv_freq = 1.0 / (cfg.theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    low_wavelen = cfg.original_max_position_embeddings / cfg.low_freq_factor
    high_wavelen = cfg.original_max_position_embeddings / cfg.high_freq_factor
    wavelen = 2.0 * np.pi / inv_freq
    # long wavelengths are fully scaled down, short ones untouched, smooth ramp between
    smooth = (cfg.original_max_position_embeddings / wavelen - cfg.low_freq_factor) / (
        cfg.high_freq_factor - cfg.low_freq_factor
    )
    scaled = np.where(
        wavelen < high_wavelen,
        inv_freq,
        np.where(
            wavelen > low_wavelen,
            inv_freq / cfg.factor,
            (1.0 - smooth) * inv_freq / cfg.factor + smooth * inv_freq,
        ),
    )
    return scaled.astype(np.float32)


def rope_table(head_dim: int, max_len: int, cfg: RopeConfig) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables of shape [max_len, head_dim // 2], float32.

    Returned as HOST (numpy) arrays on purpose: they are closure constants of
    the jitted prefill/decode programs, and MLIR lowering embeds constants by
    value — a device-resident constant forces a device->host download at
    *lowering* time, which through the axon tunnel can stall for minutes.
    """
    inv_freq = llama3_inv_freq(head_dim, cfg)
    t = np.arange(max_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)
    return np.cos(freqs), np.sin(freqs)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               positions: jnp.ndarray) -> jnp.ndarray:
    """Rotate q or k.

    x:         [..., T, H, D]  (positions index the T axis)
    cos/sin:   [max_len, D//2] (numpy or jax; numpy embeds as a host literal)
    positions: [..., T] int32
    """
    c = jnp.asarray(cos)[positions][..., None, :]   # [..., T, 1, D//2]
    s = jnp.asarray(sin)[positions][..., None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)
