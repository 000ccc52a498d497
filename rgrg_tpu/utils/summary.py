"""Model introspection: parameter counts per module subtree.

Replaces the reference's torchinfo summary helper
(language_model.py:655-677) with a pytree walker.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def param_counts(tree: Any, depth: int = 2) -> Dict[str, int]:
    """Parameter counts grouped by the first `depth` path components."""
    counts: Dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = [str(getattr(p, "key", p)) for p in path[:depth]]
        key = "/".join(keys)
        counts[key] = counts.get(key, 0) + int(np.prod(leaf.shape))
    return counts


def summarize(tree: Any, depth: int = 2) -> str:
    counts = param_counts(tree, depth)
    total = sum(counts.values())
    lines = [f"{'module':50s} {'params':>14s}"]
    for k in sorted(counts):
        lines.append(f"{k:50s} {counts[k]:>14,d}")
    lines.append(f"{'TOTAL':50s} {total:>14,d}")
    return "\n".join(lines)
