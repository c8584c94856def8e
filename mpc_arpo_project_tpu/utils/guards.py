"""In-graph numeric guards (SURVEY §5.2 — jit-vs-eager consistency and
NaN/divergence detection for the ADMM loop and rollouts)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def check_finite_tree(tree: Any, name: str = "tree") -> None:
    """Host-side: raise if any leaf contains non-finite values (use on rollout
    outputs in drivers/tests; in-graph paths rely on masked statuses)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def finite_or(x: jnp.ndarray, fallback: float) -> jnp.ndarray:
    """In-graph: replace non-finite entries (guards optional telemetry paths)."""
    return jnp.where(jnp.isfinite(x), x, fallback)
