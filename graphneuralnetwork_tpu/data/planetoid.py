"""Cora-style citation dataset loading (``.content`` / ``.cites`` format).

Replicates the reference pipeline (GCN/data_utils.py:14-89):
  * ``.content`` rows: <paper_id> <feat_0..feat_k> <label>
  * ``.cites`` rows:   <cited> <citing>
  * features row-normalised (:39-51), adjacency symmetrised (:35),
    self-loops + D^-1/2(A+I)D^-1/2 (:54-60),
  * fixed splits: train idx 0-140, val 200-500, test 500-1500
    (GCN/data_utils.py:80-82).

Datasets are not shipped with the reference (no data/ directories exist in
its tree); ``load_cora`` reads them from ``root`` if present, otherwise a
deterministic synthetic citation graph with Cora's exact shape
(N=2708, F=1433, C=7) is generated so every example/test runs hermetically.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph, gcn_graph, row_normalize_features


@dataclass(frozen=True)
class NodeClassificationData:
    graph: Graph
    features: jnp.ndarray          # [N, F] row-normalised
    labels: jnp.ndarray            # int32[N]
    train_idx: jnp.ndarray
    val_idx: jnp.ndarray
    test_idx: jnp.ndarray
    num_classes: int

    # raw edges for models that need their own normalisation
    raw_senders: np.ndarray = None
    raw_receivers: np.ndarray = None


def synthetic_citation_graph(
    n_nodes: int = 2708, n_feats: int = 1433, n_classes: int = 7,
    avg_degree: float = 2.0, homophily: float = 0.9, seed: int = 0,
):
    """Planted-partition citation graph: class-pure features + mostly
    intra-class edges, so a GNN can genuinely learn (acts as the Cora
    stand-in for tests/benches; same tensor shapes and splits)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, n_nodes).astype(np.int32)
    # Sparse binary features: a class-specific block plus noise words.
    feats = np.zeros((n_nodes, n_feats), dtype=np.float32)
    words_per_class = n_feats // n_classes
    for i in range(n_nodes):
        c = labels[i]
        block = rng.integers(c * words_per_class, (c + 1) * words_per_class,
                             size=12)
        noise = rng.integers(0, n_feats, size=8)
        feats[i, block] = 1.0
        feats[i, noise] = 1.0
    n_edges = int(n_nodes * avg_degree)
    src = rng.integers(0, n_nodes, n_edges)
    same = rng.random(n_edges) < homophily
    dst = np.empty(n_edges, dtype=np.int64)
    # Intra-class edges: pick a random node of the same class.
    by_class = [np.flatnonzero(labels == c) for c in range(n_classes)]
    for k in range(n_edges):
        if same[k]:
            pool = by_class[labels[src[k]]]
            dst[k] = pool[rng.integers(0, len(pool))]
        else:
            dst[k] = rng.integers(0, n_nodes)
    keep = src != dst
    return feats, labels, src[keep].astype(np.int32), dst[keep].astype(np.int32)


def _read_content_cites(root: str, name: str):
    content = np.genfromtxt(os.path.join(root, f"{name}.content"),
                            dtype=np.dtype(str))
    ids = content[:, 0]
    feats = content[:, 1:-1].astype(np.float32)
    label_names = content[:, -1]
    classes = sorted(set(label_names))
    labels = np.array([classes.index(l) for l in label_names],
                      dtype=np.int32)
    id_map = {j: i for i, j in enumerate(ids)}
    cites = np.genfromtxt(os.path.join(root, f"{name}.cites"),
                          dtype=np.dtype(str))
    edges = np.array(
        [(id_map[a], id_map[b]) for a, b in cites
         if a in id_map and b in id_map], dtype=np.int32)
    return feats, labels, edges[:, 0], edges[:, 1]


#: Synthetic-fallback shapes per dataset name (real shapes of the public
#: planetoid datasets; the north-star accuracy targets name cora/citeseer).
_SHAPES = {
    "cora": dict(n_nodes=2708, n_feats=1433, n_classes=7),
    "citeseer": dict(n_nodes=3327, n_feats=3703, n_classes=6),
}


def load_cora(root: str | None = None, name: str = "cora",
              seed: int = 0,
              layout: str = "coo",
              layout_objective: str = "spmm") -> NodeClassificationData:
    """Load Cora/Citeseer (or compatible .content/.cites dataset), else
    synthesise at the named dataset's exact shape.

    Split indices follow GCN/data_utils.py:80-82 exactly.

    ``layout="hybrid"`` builds the locality-clustered BCSR fast path
    (core/bcsr.py): nodes are relabelled by the clustering permutation,
    features/labels are permuted to match, and the split index arrays are
    mapped through the inverse — models and accuracies are unchanged,
    only the SpMM gets faster on clustered graphs.

    ``layout="auto"`` probes the post-clustering tile fill and picks
    hybrid or COO itself (core/layout.py) — the TPU-first default.
    """
    if root is not None and os.path.exists(
            os.path.join(root, f"{name}.content")):
        feats, labels, s, r = _read_content_cites(root, name)
    else:
        feats, labels, s, r = synthetic_citation_graph(
            seed=seed, **_SHAPES.get(name, _SHAPES["cora"]))

    n = feats.shape[0]
    feats = row_normalize_features(feats)
    num_classes = int(labels.max()) + 1
    train_idx = np.arange(0, 140, dtype=np.int32)
    val_idx = np.arange(200, 500, dtype=np.int32)
    test_idx = np.arange(500, 1500, dtype=np.int32)

    probe_perm = None
    if layout == "auto":
        from ..core.graph import add_self_loops, symmetrize
        from ..core.layout import choose_layout
        # probe the exact edge set the hybrid build would tile
        s_p, r_p = symmetrize(s, r)
        s_p, r_p = add_self_loops(s_p, r_p, n)
        layout, _, probe_perm = choose_layout(
            s_p, r_p, n, objective=layout_objective, verbose=True,
            tag=name)

    if layout == "hybrid":
        from ..core.graph import gcn_graph_hybrid
        from ..core.reorder import invert_permutation
        graph, perm = gcn_graph_hybrid(s, r, n, perm=probe_perm)
        inv = invert_permutation(perm)
        feats = feats[perm]
        labels = labels[perm]
        train_idx = inv[train_idx].astype(np.int32)
        val_idx = inv[val_idx].astype(np.int32)
        test_idx = inv[test_idx].astype(np.int32)
        s, r = inv[s].astype(np.int32), inv[r].astype(np.int32)
    else:
        assert layout == "coo", layout
        graph = gcn_graph(s, r, n)
    return NodeClassificationData(
        graph=graph,
        features=jnp.asarray(feats),
        labels=jnp.asarray(labels),
        train_idx=jnp.asarray(train_idx),
        val_idx=jnp.asarray(val_idx),
        test_idx=jnp.asarray(test_idx),
        num_classes=num_classes,
        raw_senders=s, raw_receivers=r,
    )


def load_citeseer(root: str | None = None,
                  seed: int = 0) -> NodeClassificationData:
    """Citeseer via the same .content/.cites pipeline (north-star dataset)."""
    return load_cora(root=root, name="citeseer", seed=seed)
