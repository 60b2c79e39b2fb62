"""Pubmed citation dataset (GraphSAGE form).

Real data: NCBI tab format (``Pubmed-Diabetes.NODE.paper.tab`` +
``.DIRECTED.cites.tab``) parsed as in GraphSAGE_Pytorch/data_utils.py:7-42.
Fallback: synthetic citation graph with Pubmed's shape (N=19717, F=500,
C=3 — scaled down by default for speed). Ratio split 10/30/60
(GraphSAGE_Pytorch/data_utils.py:45-49).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .planetoid import synthetic_citation_graph


@dataclass(frozen=True)
class SampledNodeData:
    """Host-side arrays for the sampled mini-batch pipeline."""
    features: np.ndarray     # [N, F] float32
    labels: np.ndarray       # [N] int32
    senders: np.ndarray
    receivers: np.ndarray
    train_idx: np.ndarray
    val_idx: np.ndarray
    test_idx: np.ndarray
    num_classes: int


def _parse_pubmed_tab(root: str):
    node_file = os.path.join(root, "Pubmed-Diabetes.NODE.paper.tab")
    cite_file = os.path.join(root, "Pubmed-Diabetes.DIRECTED.cites.tab")
    with open(node_file) as f:
        lines = f.readlines()
    # Header row 1 declares fields as '<kind>:<name>:<default>'; only the
    # 'numeric:w-*' fields are features (label:cat and summary:string are
    # not) — GraphSAGE_Pytorch/data_utils.py:20 keeps len(feat_map)-2.
    feat_names = [w.split(":")[1] for w in lines[1].split()
                  if w.startswith("numeric:")]
    fmap = {w: i for i, w in enumerate(feat_names)}
    ids, labels, feats = [], [], []
    id_map = {}
    for line in lines[2:]:
        parts = line.strip().split("\t")
        pid = parts[0]
        id_map[pid] = len(ids)
        ids.append(pid)
        labels.append(int(parts[1].split("=")[1]) - 1)
        row = np.zeros(len(fmap), np.float32)
        for tok in parts[2:-1]:
            k, v = tok.split("=")
            if k in fmap:
                row[fmap[k]] = float(v)
        feats.append(row)
    s, r = [], []
    with open(cite_file) as f:
        for line in f.readlines()[2:]:
            parts = line.strip().split("\t")
            a = parts[1].split(":")[1]
            b = parts[-1].split(":")[1]
            if a in id_map and b in id_map:
                s.append(id_map[a])
                r.append(id_map[b])
    return (np.stack(feats), np.array(labels, np.int32),
            np.array(s, np.int32), np.array(r, np.int32))


def load_pubmed(root: str | None = None, seed: int = 0,
                n_nodes: int = 2000, n_feats: int = 500,
                ratios=(0.1, 0.3, 0.6)) -> SampledNodeData:
    """Ratio split 10/30/60 (GraphSAGE_Pytorch/data_utils.py:45-49)."""
    if root is not None and os.path.exists(
            os.path.join(root, "Pubmed-Diabetes.NODE.paper.tab")):
        feats, labels, s, r = _parse_pubmed_tab(root)
    else:
        feats, labels, s, r = synthetic_citation_graph(
            n_nodes=n_nodes, n_feats=n_feats, n_classes=3,
            avg_degree=4.0, seed=seed)
    # symmetrise for sampling
    s2 = np.concatenate([s, r])
    r2 = np.concatenate([r, s])
    n = feats.shape[0]
    k1 = int(n * ratios[0])
    k2 = int(n * (ratios[0] + ratios[1]))
    idx = np.arange(n)
    return SampledNodeData(
        features=feats.astype(np.float32), labels=labels,
        senders=s2, receivers=r2,
        train_idx=idx[:k1], val_idx=idx[k1:k2], test_idx=idx[k2:],
        num_classes=int(labels.max()) + 1)


def load_pubmed_fullbatch(root: str | None = None, seed: int = 0,
                          layout: str = "hybrid",
                          min_edges_per_tile: int = 64):
    """Full-batch form of the Pubmed data for SAGEConv-style models:
    symmetrised graph in the requested layout with row-normalised
    features (the sampled mini-batch pipeline keeps ``load_pubmed``).

    ``layout="hybrid"`` locality-clusters the nodes and returns a
    HybridGraph with features/labels permuted and split indices remapped
    (same convention as ``load_cora(layout="hybrid")``).
    ``layout="auto"`` probes post-clustering tile fill and picks
    hybrid/COO itself (core/layout.py)."""
    import jax.numpy as jnp

    from ..core.bcsr import build_hybrid
    from ..core.graph import (build_graph, row_normalize_features,
                              symmetrize)
    from ..core.reorder import (invert_permutation, locality_order,
                                relabel_edges)
    from .planetoid import NodeClassificationData

    sd = load_pubmed(root=root, seed=seed)
    n = sd.features.shape[0]
    s, r = symmetrize(sd.senders, sd.receivers)
    feats = sd.features
    labels = sd.labels
    train, val, test = sd.train_idx, sd.val_idx, sd.test_idx
    probe_perm = None
    if layout == "auto":
        from ..core.layout import choose_layout
        layout, _, probe_perm = choose_layout(
            s, r, n, min_edges_per_tile=min_edges_per_tile,
            verbose=True, tag="pubmed")
    if layout == "hybrid":
        perm = probe_perm if probe_perm is not None \
            else locality_order(s, r, n)
        inv = invert_permutation(perm)
        s, r = relabel_edges(perm, s, r)
        feats, labels = feats[perm], labels[perm]
        train, val, test = inv[train], inv[val], inv[test]
        graph = build_hybrid(s, r, n,
                             min_edges_per_tile=min_edges_per_tile,
                             symmetric=True)
    else:
        assert layout == "coo", layout
        graph = build_graph(s, r, n)
    return NodeClassificationData(
        graph=graph,
        features=jnp.asarray(row_normalize_features(feats)),
        labels=jnp.asarray(labels),
        train_idx=jnp.asarray(train.astype(np.int32)),
        val_idx=jnp.asarray(val.astype(np.int32)),
        test_idx=jnp.asarray(test.astype(np.int32)),
        num_classes=sd.num_classes,
        raw_senders=s, raw_receivers=r)
