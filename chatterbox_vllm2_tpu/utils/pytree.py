"""Split a parameter pytree into (array leaves, static skeleton).

Jitted entry points must take weights as ARGUMENTS (closed-over device
arrays are baked into the HLO as literals — slow tunnel download at lowering
and programs that exceed the remote-compile size cap) — but our parameter
trees also carry static Python metadata (e.g. conv `_meta` kernel/dilation
ints) that must NOT become tracers.  `split_arrays` extracts just the array
leaves to pass through jit; `merge_arrays` rebuilds the full tree inside.
"""

from __future__ import annotations

import jax


def _is_array(leaf) -> bool:
    return hasattr(leaf, "shape") and hasattr(leaf, "dtype")


def split_arrays(tree):
    """tree -> (arrays: list, spec).  `spec` holds the treedef plus every
    non-array leaf inline (None marks an array slot)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = [leaf for leaf in leaves if _is_array(leaf)]
    skeleton = tuple(None if _is_array(leaf) else leaf for leaf in leaves)
    return arrays, (treedef, skeleton)


def merge_arrays(arrays, spec):
    """Inverse of split_arrays (arrays may be tracers)."""
    treedef, skeleton = spec
    it = iter(arrays)
    leaves = [next(it) if s is None else s for s in skeleton]
    return jax.tree_util.tree_unflatten(treedef, leaves)
