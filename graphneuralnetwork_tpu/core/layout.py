"""Automatic graph-layout selection: probe locality, pick hybrid or COO.

The hybrid dense-tile BCSR layout (core/bcsr.py) is 2.5-3.5x the COO
path on blocky graphs (HAN metapath near-cliques, community graphs) but
marginal on homophily citation synthetics (PERF_NOTES round 4: +2.6%
GCN end-to-end vs 3.5x SpMM on the community bench). The TPU-first
default should make that structure-dependent call itself instead of
leaving ``--layout`` a manual footnote, so ``choose_layout`` probes the
post-clustering layout and decides on modeled HBM traffic — the
quantity the SpMM is actually bound by (PERF_NOTES):

  * cluster with LPA/RCM (``core/reorder.locality_order`` — the same
    ordering the hybrid build would use, so the probe measures exactly
    what the build would get);
  * split tiles at the ``build_hybrid`` break-even
    (>= ``min_edges_per_tile`` edges per 128x128 tile);
  * model the bytes each layout moves per SpMM:
    ``coo    = E * F * 4``                      (one x row per edge)
    ``hybrid = T_dense * (RB*CB + CB*F) * 4 + E_rem * F * 4``
    and pick hybrid iff ``hybrid/coo <= max_byte_ratio`` (default 0.75
    — below a ~25% modeled saving the permutation indirection and tile
    store are not worth the build).

Measured probe ratios (this machine, F=128): community bench graph
0.35-0.43 and synthetic ACM metapaths << 0.5 -> hybrid; homophily
citation synthetics 0.85-0.89 (their LPA clusters hold tiles only just
above break-even, matching the +2.6% end-to-end round-4 measurement)
and random graphs 1.0 -> COO. The threshold sits in a wide gap.

The probe pays the clustering pass; when hybrid is chosen the
permutation is returned for reuse so the build never clusters twice.

No reference counterpart: the reference hardcodes one layout per model
(torch sparse COO everywhere, e.g. GCN/data_utils.py:54-70).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .bcsr import COL_BLOCK, ROW_BLOCK
from .reorder import locality_order, relabel_edges

#: Above this modeled hybrid/COO traffic ratio the hybrid layout is not
#: worth building (see module docstring for the measured separation).
MAX_BYTE_RATIO = 0.75

#: Attention objective: the COO attention path is far worse than COO
#: SpMM (it materialises [E, H·F] per-edge messages and pays per-edge
#: softmax), so hybrid pays off at much lower tile fill — measured: the
#: 65k homophily synthetic (tiled fraction 0.51, SpMM byte ratio 0.89 →
#: "coo" under the SpMM rule) trains full GAT 2.2× faster on hybrid
#: with the one-kernel attend + kernel backward. Random graphs (~0
#: tiled) still stay COO.
MIN_ATTENTION_TILED_FRACTION = 0.25

#: Nominal feature width for the traffic model — the framework's hidden
#: sizes cluster around 128 (GCN hidden, GAT heads*feat); the decision
#: is threshold-robust across 32..256 (the measured gap is wide).
PROBE_FEAT = 128


def probe_layout(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_nodes: int,
    *,
    min_edges_per_tile: int = 192,
    feat: int = PROBE_FEAT,
    perm: Optional[np.ndarray] = None,
) -> Tuple[float, float, np.ndarray]:
    """Cluster (unless ``perm`` given) and model both layouts' traffic.

    Returns ``(tiled_fraction, byte_ratio, perm)`` where
    ``tiled_fraction`` is the edge mass landing in dense tiles and
    ``byte_ratio`` the modeled hybrid/COO bytes-per-SpMM ratio (1.0 when
    nothing tiles).
    """
    s = np.asarray(senders, np.int64).ravel()
    r = np.asarray(receivers, np.int64).ravel()
    if perm is None:
        perm = locality_order(s, r, n_nodes)
    s2, r2 = relabel_edges(perm, s, r)
    e = len(s2)
    if e == 0:
        return 0.0, 1.0, perm
    n_cb = -(-max(n_nodes, 1) // COL_BLOCK)
    key = (np.asarray(r2, np.int64) // ROW_BLOCK) * n_cb \
        + (np.asarray(s2, np.int64) // COL_BLOCK)
    _, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    dense = cnt >= min_edges_per_tile
    t_dense = int(dense.sum())
    e_rem = int(cnt[~dense].sum())
    bytes_coo = e * feat * 4
    bytes_hyb = (t_dense * (ROW_BLOCK * COL_BLOCK + COL_BLOCK * feat) * 4
                 + e_rem * feat * 4)
    frac = float((cnt[inv] >= min_edges_per_tile).mean())
    return frac, bytes_hyb / bytes_coo, perm


def choose_layout(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_nodes: int,
    *,
    min_edges_per_tile: int = 192,
    max_byte_ratio: float = MAX_BYTE_RATIO,
    objective: str = "spmm",
    verbose: bool = False,
    tag: str = "graph",
) -> Tuple[str, float, np.ndarray]:
    """Decide ``"hybrid"`` vs ``"coo"`` for this edge set.

    ``objective="spmm"`` (static-weight aggregation, e.g. GCN) decides
    on the modeled traffic ratio; ``objective="attention"`` (per-step
    softmax scores, e.g. GAT) decides on tiled-edge fraction with a
    much lower bar — see MIN_ATTENTION_TILED_FRACTION.

    Returns ``(layout, byte_ratio, perm)``; ``perm`` is the clustering
    permutation the probe computed (reuse it for the hybrid build).
    Logs the decision when ``verbose``.
    """
    frac, ratio, perm = probe_layout(
        senders, receivers, n_nodes,
        min_edges_per_tile=min_edges_per_tile)
    if objective == "attention":
        layout = ("hybrid" if frac >= MIN_ATTENTION_TILED_FRACTION
                  else "coo")
        crit = (f"tiled fraction {frac:.3f} "
                f"{'>=' if layout == 'hybrid' else '<'} "
                f"{MIN_ATTENTION_TILED_FRACTION:g} (attention)")
    else:
        layout = "hybrid" if ratio <= max_byte_ratio else "coo"
        crit = (f"modeled hybrid/COO traffic {ratio:.3f} "
                f"{'<=' if layout == 'hybrid' else '>'} "
                f"{max_byte_ratio:g}")
    if verbose:
        print(f"layout auto [{tag}]: tiled-edge fraction {frac:.3f}, "
              f"{crit} -> {layout}")
    return layout, ratio, perm
