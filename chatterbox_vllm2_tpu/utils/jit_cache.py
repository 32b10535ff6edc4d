"""Persistent XLA compilation cache.

Compilation through the axon TPU tunnel is slow (minutes for the unrolled
30-layer decode program), but fully cacheable: enabling JAX's persistent
compilation cache turns every warm start into seconds.  `bench.py`,
`__graft_entry__.py`, and `server/http.py:main` call this at startup; library
users can opt in themselves.

The default cache directory lives inside the repo (`<repo>/.xla_cache`,
gitignored) so every entry point that runs from this checkout shares one
cache regardless of $HOME.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".xla_cache",
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    $CHATTERBOX_XLA_CACHE or `<repo>/.xla_cache`).  Safe to call multiple
    times; returns the directory used."""
    import jax

    path = path or os.environ.get("CHATTERBOX_XLA_CACHE") or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
