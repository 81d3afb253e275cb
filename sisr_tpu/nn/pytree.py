"""Path-addressed pytree utilities.

Params and state live in nested dicts with stable string keys; these helpers
flatten them to '/'-joined path -> leaf maps. The flat form is the
framework's checkpoint wire format and the substrate for the pytree-surgery
(transplant) API — the TPU-native replacement for torch state_dict name
matching (reference model_generator.py:65-84).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def flatten_with_paths(tree, prefix: str = "") -> Dict[str, jax.Array]:
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            p = f"{prefix}/{k}" if prefix else str(k)
            out.update(flatten_with_paths(tree[k], p))
        return out
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            p = f"{prefix}/{i}" if prefix else str(i)
            out.update(flatten_with_paths(v, p))
        return out
    out[prefix] = tree
    return out


def unflatten_from_paths(flat: Dict[str, jax.Array]):
    """Rebuild a nested structure. Integer path components become list
    indices; everything else dict keys."""
    root: dict = {}
    for path, leaf in flat.items():
        parts = path.split("/")
        node = root
        for i, part in enumerate(parts[:-1]):
            node = node.setdefault(part, {})
        node[parts[-1]] = leaf

    def _listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [_listify(node[k]) for k in sorted(keys, key=int)]
        return {k: _listify(v) for k, v in node.items()}

    return _listify(root)


def tree_paths(tree):
    return list(flatten_with_paths(tree).keys())


def count_params(tree) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(np.prod(l.shape) if hasattr(l, "shape") else 1 for l in leaves))


def tree_cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
