"""Conditional flow matching: Euler solver with vocoder-side CFG.

Matches reference `flow_matching.py`:
  * fixed pre-drawn noise buffer (CausalConditionalCFM, `:198-228`) makes mel
    generation deterministic given tokens — exploited by our golden tests;
  * cosine t-schedule: t = 1 - cos(u * pi/2) (`:225-227`);
  * each Euler step runs the estimator with batch 2 per sample: row 0 carries
    (mu, spks, cond), row 1 zeros them; combined as
    (1 + r) * v_cond - r * v_uncond with r = 0.7 (`solve_euler :105-126`).

The step loop is a `lax.scan`, so the 10-step solve compiles to one XLA
program regardless of n_timesteps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import CfmConfig, UNetConfig
from .unet import unet_apply


def make_rand_noise(key: jax.Array, max_len: int = 15000) -> jnp.ndarray:
    """Pre-drawn noise [1, 80, max_len] (reference `flow_matching.py:201`).
    Loaded from a converted checkpoint when mel parity with the reference's
    exact buffer matters; otherwise any fixed draw works."""
    return jax.random.normal(key, (1, 80, max_len), jnp.float32)


def t_span_cosine(n_timesteps: int) -> np.ndarray:
    u = np.linspace(0.0, 1.0, n_timesteps + 1, dtype=np.float32)
    return 1.0 - np.cos(u * 0.5 * np.pi)


def cfm_solve(
    unet_params: dict,
    unet_cfg: UNetConfig,
    cfm_cfg: CfmConfig,
    mu: jnp.ndarray,          # [B, 80, T]
    spks: jnp.ndarray,        # [B, 80]
    cond: jnp.ndarray,        # [B, 80, T]
    rand_noise: jnp.ndarray,  # [1, 80, >=T]
    mask: jnp.ndarray | None = None,   # [B, 1, T]
    n_timesteps: int | None = None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Returns the generated mel [B, 80, T]."""
    B, C, T = mu.shape
    n = n_timesteps or cfm_cfg.n_timesteps
    r = cfm_cfg.inference_cfg_rate

    x = jnp.broadcast_to(rand_noise[:, :, :T], (B, C, T)).astype(mu.dtype) * temperature
    ts = jnp.asarray(t_span_cosine(n))
    t_starts, dts = ts[:-1], ts[1:] - ts[:-1]

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * B,), t, x.dtype)
        v = unet_apply(unet_params, unet_cfg, x2, mu2, t2, spks2, cond2, mask2)
        v_cond, v_uncond = v[:B], v[B:]
        dphi = (1.0 + r) * v_cond - r * v_uncond
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, x, (t_starts, dts))
    return x.astype(jnp.float32)
