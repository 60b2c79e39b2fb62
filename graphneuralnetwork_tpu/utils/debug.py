"""Debug utilities: NaN checking and determinism helpers.

The reference's only numeric guards are four inline asserts in the SpGAT
forward (GAT/models/layers.py:102,109,119,124). Here the equivalent is a
flag-gated ``checkify`` wrapper usable around any jitted step, plus
explicit nan-scan helpers — JAX being functional, determinism tests
replace race detection (SURVEY.md §5).

Enable globally with ``GNN_TPU_DEBUG_NANS=1`` or per-call via
``nan_checked``.
"""

from __future__ import annotations

import os
from functools import wraps
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def debug_nans_enabled() -> bool:
    return os.environ.get("GNN_TPU_DEBUG_NANS", "0") == "1"


def nan_checked(fn: Callable) -> Callable:
    """Wrap a jittable fn with checkify float checks (NaN/Inf/div0). The
    wrapper raises on the host when a check fires; zero cost when the
    debug flag is off."""

    @wraps(fn)
    def wrapper(*args, **kwargs):
        if not debug_nans_enabled():
            return fn(*args, **kwargs)
        checked = checkify.checkify(fn, errors=checkify.float_checks)
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side check of every leaf (post-step audit in tests/drivers)."""
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: {', '.join(bad)}")


def find_nonfinite(tree) -> list[str]:
    out = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            n = int(jnp.sum(~jnp.isfinite(leaf)))
            if n:
                out.append(f"{jax.tree_util.keystr(path)}: {n} bad")

    jax.tree_util.tree_map_with_path(visit, tree)
    return out
