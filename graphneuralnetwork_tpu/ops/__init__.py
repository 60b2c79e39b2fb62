"""Compute ops: segment reductions, SpMM/SDDMM, with XLA and Pallas paths."""

import os

import jax

_FORCE = os.environ.get("GNN_TPU_OPS", "auto")  # 'auto' | 'xla' | 'pallas'


def set_ops_impl(impl: str) -> None:
    """Force the op implementation globally: 'auto', 'xla', or 'pallas'."""
    global _FORCE
    assert impl in ("auto", "xla", "pallas"), impl
    _FORCE = impl


def _use_pallas(x) -> bool:
    if _FORCE == "xla":
        return False
    if _FORCE == "pallas":
        return True
    # auto: Pallas only on TPU-ish backends.
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend not in ("cpu", "gpu")


from .aggregate import aggregate_edges  # noqa: E402,F401
from .segment import (  # noqa: E402,F401
    edge_softmax,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from .spmm import (  # noqa: E402,F401
    sddmm_additive,
    sddmm_dot,
    spmm,
    spmm_coo,
    spmm_weighted,
)
