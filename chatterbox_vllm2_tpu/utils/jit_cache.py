"""Persistent XLA compilation cache.

Compilation through the axon TPU tunnel is slow (minutes for the unrolled
30-layer decode program), but fully cacheable: enabling JAX's persistent
compilation cache turns every warm start into seconds.  The serving stack
(bench.py, the HTTP server, the driver entry points) calls this at startup;
library users can opt in themselves.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    $CHATTERBOX_XLA_CACHE or ~/.cache/chatterbox_vllm2_tpu/xla).  Safe to
    call multiple times; returns the directory used."""
    import jax

    path = (path or os.environ.get("CHATTERBOX_XLA_CACHE")
            or os.path.expanduser("~/.cache/chatterbox_vllm2_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
