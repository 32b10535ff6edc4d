"""Device mesh construction.

Axes (SURVEY.md §5.8):
  data  — request batching spans hosts (DCN); CFG pairs stay together
  model — tensor parallelism over ICI: attention heads, MLP intermediate,
          speech-vocab dim of the LM head, and KV-cache heads

The reference never exercises real parallelism (vLLM TP=1 throughout,
reference `README.md:40`); this module is where our multi-chip story lives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(f"need {n} devices for mesh {cfg}, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(arr, ("data", "model"))
