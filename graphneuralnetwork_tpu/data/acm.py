"""ACM heterogeneous dataset (HAN / GTN form).

Real data: the reference loads a MATLAB .mat with PvsA/PvsL/PvsC etc.
matrices (HAN/utils/data_utils.py:13-89) or pre-pickled edges/labels
(GTN/utils/data_utils.py:129-150). ``load_acm_han``/``load_acm_gtn`` read
those formats when files exist; otherwise a deterministic synthetic ACM
(papers/authors/subjects with class-correlated wiring) is generated so
everything runs hermetically.

Splits:
  * GTN: 200 train + 100 val per class, rest test
    (GTN/utils/data_utils.py:117-126).
  * HAN: float-mask ≤0.2 train / ≤0.3 val (HAN/utils/data_utils.py:62-69) —
    reproduced as a uniform draw with the same proportions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.graph import Graph, row_normalize_features
from ..core.hetero import HeteroGraph


@dataclass(frozen=True)
class HeteroNodeData:
    """Per-metapath graphs + paper features/labels (HAN input form)."""
    graphs: List[Graph]
    features: jnp.ndarray
    labels: jnp.ndarray
    train_idx: jnp.ndarray
    val_idx: jnp.ndarray
    test_idx: jnp.ndarray
    num_classes: int


@dataclass(frozen=True)
class StackedAdjData:
    """Dense stacked edge-type adjacency [T, N, N] + features (GTN form)."""
    adj: jnp.ndarray
    features: jnp.ndarray
    labels: jnp.ndarray          # labels for target nodes (papers)
    target_idx: jnp.ndarray      # global ids of target-type nodes
    train_idx: jnp.ndarray       # indices into target nodes
    val_idx: jnp.ndarray
    test_idx: jnp.ndarray
    num_classes: int


def synthetic_acm(
    n_papers: int = 600, n_authors: int = 300, n_subjects: int = 20,
    n_feats: int = 128, n_classes: int = 3, seed: int = 0,
):
    """Class-structured synthetic ACM: papers belong to classes; authors
    and subjects are class-biased, so PAP/PLP metapaths carry signal."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, n_papers).astype(np.int32)
    author_class = rng.integers(0, n_classes, n_authors).astype(np.int32)
    subject_class = (np.arange(n_subjects) % n_classes).astype(np.int32)

    # Each paper has 2-3 authors, mostly of its class.
    pa_p, pa_a = [], []
    for p in range(n_papers):
        k = rng.integers(2, 4)
        same = np.flatnonzero(author_class == labels[p])
        other = np.arange(n_authors)
        for _ in range(k):
            pool = same if (rng.random() < 0.8 and len(same)) else other
            pa_p.append(p)
            pa_a.append(int(pool[rng.integers(0, len(pool))]))
    # One subject per paper, 85% class-aligned.
    pl_p, pl_l = [], []
    for p in range(n_papers):
        same = np.flatnonzero(subject_class == labels[p])
        if rng.random() < 0.85 and len(same):
            l = int(same[rng.integers(0, len(same))])
        else:
            l = int(rng.integers(0, n_subjects))
        pl_p.append(p)
        pl_l.append(l)

    feats = np.zeros((n_papers, n_feats), np.float32)
    wpc = n_feats // n_classes
    for p in range(n_papers):
        c = labels[p]
        idx = rng.integers(c * wpc, (c + 1) * wpc, size=8)
        feats[p, idx] = 1.0
        feats[p, rng.integers(0, n_feats, size=5)] = 1.0

    hg = HeteroGraph({"paper": n_papers, "author": n_authors,
                      "subject": n_subjects})
    hg.add_relation(("paper", "pa", "author"),
                    np.array(pa_p), np.array(pa_a))
    hg.add_relation(("author", "ap", "paper"),
                    np.array(pa_a), np.array(pa_p))
    hg.add_relation(("paper", "pl", "subject"),
                    np.array(pl_p), np.array(pl_l))
    hg.add_relation(("subject", "lp", "paper"),
                    np.array(pl_l), np.array(pl_p))
    return hg, feats, labels


def _load_acm_mat(path: str):
    """Read the reference's ACM.mat (HAN/utils/data_utils.py:13-60)."""
    from scipy import io as sio

    data = sio.loadmat(path)
    p_vs_l = data["PvsL"]
    p_vs_a = data["PvsA"]
    p_vs_t = data["PvsT"]
    p_vs_c = data["PvsC"]
    # conferences → 3 classes as in HAN/utils/data_utils.py:24-42
    conf_ids = [0, 1, 9, 10, 13]
    label_ids = [0, 1, 2, 2, 1]
    p_vs_c_filter = p_vs_c[:, conf_ids]
    keep = np.asarray(p_vs_c_filter.sum(1)).ravel() > 0
    p_vs_l = p_vs_l[keep]
    p_vs_a = p_vs_a[keep]
    p_vs_t = p_vs_t[keep]
    p_vs_c = p_vs_c[keep][:, conf_ids]
    labels = np.zeros(p_vs_c.shape[0], np.int32)
    for cid, lid in zip(range(len(conf_ids)), label_ids):
        idx = np.asarray(p_vs_c[:, cid].todense()).ravel() > 0
        labels[idx] = lid
    feats = np.asarray(p_vs_t.todense(), dtype=np.float32)

    pa = p_vs_a.tocoo()
    pl = p_vs_l.tocoo()
    hg = HeteroGraph({"paper": feats.shape[0], "author": p_vs_a.shape[1],
                      "subject": p_vs_l.shape[1]})
    hg.add_relation(("paper", "pa", "author"), pa.row, pa.col)
    hg.add_relation(("author", "ap", "paper"), pa.col, pa.row)
    hg.add_relation(("paper", "pl", "subject"), pl.row, pl.col)
    hg.add_relation(("subject", "lp", "paper"), pl.col, pl.row)
    return hg, feats, labels


_ACM_METAPATHS = (
    (("paper", "pa", "author"), ("author", "ap", "paper")),   # PAP
    (("paper", "pl", "subject"), ("subject", "lp", "paper")),  # PLP
)


def _hybrid_metapath_graphs(hg, n: int, metapaths,
                            min_edges_per_tile: int, perm=None):
    """Compose each metapath as a binarized edge list (+ self loops),
    locality-cluster the target nodes over the UNION of metapath edges,
    and densify each metapath adjacency into a HybridGraph.

    Metapath adjacencies (A·Aᵀ binarized, HAN/utils/data_utils.py:85-89)
    are exactly the dense-blocky case BCSR tiles are built for: papers
    sharing an author/subject form near-cliques. Unit weights keep GAT
    tile semantics (ops/bcsr_attention.py). Returns (graphs, perm)."""
    from ..core.bcsr import build_hybrid
    from ..core.reorder import locality_order, relabel_edges

    loops = np.arange(n, dtype=np.int64)
    edge_lists = []
    for keys in metapaths:
        s, d, _ = hg.compose(list(keys), binarize=True)
        keep = s != d
        edge_lists.append((np.concatenate([s[keep], loops]),
                           np.concatenate([d[keep], loops])))
    all_s = np.concatenate([e[0] for e in edge_lists])
    all_r = np.concatenate([e[1] for e in edge_lists])
    if perm is None:  # reusable from a choose_layout probe
        perm = locality_order(all_s, all_r, n)
    graphs = []
    for s, d in edge_lists:
        s2, r2 = relabel_edges(perm, s, d)
        # PAP/PLP are symmetric (R·Rᵀ), so forward tiles serve backward.
        graphs.append(build_hybrid(
            s2, r2, n, min_edges_per_tile=min_edges_per_tile,
            symmetric=True))
    return graphs, perm



def _assemble_han_data(hg, feats, labels, seed: int, layout: str,
                       min_edges_per_tile: int) -> HeteroNodeData:
    """Shared tail of the HAN loaders: float-mask split
    (HAN/utils/data_utils.py:62-69), row-normalised features, and the
    layout branch (COO metapath graphs, or clustered HybridGraphs with
    features/labels permuted and split indices remapped)."""
    n = feats.shape[0]
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    train = np.flatnonzero(u <= 0.2).astype(np.int32)
    val = np.flatnonzero((u > 0.2) & (u <= 0.3)).astype(np.int32)
    test = np.flatnonzero(u > 0.3).astype(np.int32)
    feats = row_normalize_features(feats)

    probe_perm = None
    if layout == "auto":
        # probe the union of metapath edges — the same edge set
        # _hybrid_metapath_graphs clusters over (core/layout.py)
        from ..core.layout import choose_layout
        loops = np.arange(n, dtype=np.int64)
        parts_s, parts_r = [loops], [loops]
        for keys in _ACM_METAPATHS:
            s_m, d_m, _ = hg.compose(list(keys), binarize=True)
            keep = s_m != d_m
            parts_s.append(s_m[keep])
            parts_r.append(d_m[keep])
        layout, _, probe_perm = choose_layout(
            np.concatenate(parts_s), np.concatenate(parts_r), n,
            min_edges_per_tile=min_edges_per_tile,
            objective="attention",       # HAN's node attention is GAT
            verbose=True, tag="han-metapaths")

    if layout == "hybrid":
        from ..core.reorder import invert_permutation
        graphs, perm = _hybrid_metapath_graphs(
            hg, n, _ACM_METAPATHS, min_edges_per_tile, perm=probe_perm)
        inv = invert_permutation(perm)
        feats, labels = feats[perm], labels[perm]
        train, val, test = (inv[train].astype(np.int32),
                            inv[val].astype(np.int32),
                            inv[test].astype(np.int32))
    else:
        assert layout == "coo", layout
        graphs = [hg.metapath_graph(list(k)) for k in _ACM_METAPATHS]

    return HeteroNodeData(
        graphs=graphs,
        features=jnp.asarray(feats),
        labels=jnp.asarray(labels),
        train_idx=jnp.asarray(train),
        val_idx=jnp.asarray(val),
        test_idx=jnp.asarray(test),
        num_classes=int(labels.max()) + 1,
    )


def load_acm_han(path: str | None = None, seed: int = 0,
                 layout: str = "coo", n_papers: int = 600,
                 min_edges_per_tile: int = 64) -> HeteroNodeData:
    """HAN input: PAP + PLP metapath graphs over papers
    (HAN/utils/data_utils.py:85-89).

    ``layout="hybrid"`` builds each metapath adjacency as a
    locality-clustered HybridGraph (dense MXU tiles + COO remainder);
    features/labels are permuted to the clustered order and the split
    indices mapped through the inverse, so accuracies are unchanged.
    ``n_papers`` scales the synthetic stand-in (ignored for real .mat)."""
    if path is not None and os.path.exists(path):
        hg, feats, labels = _load_acm_mat(path)
    else:
        hg, feats, labels = synthetic_acm(
            seed=seed, n_papers=n_papers, n_authors=n_papers // 2,
            n_subjects=max(20, n_papers // 30))
    return _assemble_han_data(hg, feats, labels, seed, layout,
                              min_edges_per_tile)


def _load_gtn_pickle(path: str, seed: int, per_class_train: int,
                     per_class_val: int) -> StackedAdjData:
    """Read the reference's processed train.pkl — a tuple (paper_idx,
    paper_target, edges [scipy sparse per edge type over the union node
    set], node_feature) (GTN/utils/data_utils.py:130-139) — and build the
    [T, N, N]+identity stack with per-class splits (:117-126)."""
    import pickle

    with open(path, "rb") as f:
        paper_idx, paper_target, edges, node_feature = pickle.load(f)
    n = edges[0].shape[0]
    slices = [np.asarray(e.todense(), np.float32) for e in edges]
    slices.append(np.eye(n, dtype=np.float32))
    adj = np.stack(slices, axis=0)
    labels = np.asarray(paper_target, np.int32)
    feats = np.asarray(node_feature, np.float32)

    rng = np.random.default_rng(seed)
    num_classes = int(labels.max()) + 1
    train, val, test = [], [], []
    for c in range(num_classes):
        idx = np.flatnonzero(labels == c)
        rng.shuffle(idx)
        k1 = min(per_class_train, max(len(idx) - 2, 1))
        k2 = min(per_class_val, max(len(idx) - k1 - 1, 0))
        train.extend(idx[:k1])
        val.extend(idx[k1:k1 + k2])
        test.extend(idx[k1 + k2:])
    return StackedAdjData(
        adj=jnp.asarray(adj),
        features=jnp.asarray(row_normalize_features(feats)),
        labels=jnp.asarray(labels),
        target_idx=jnp.arange(len(labels), dtype=jnp.int32),
        train_idx=jnp.asarray(np.array(sorted(train), np.int32)),
        val_idx=jnp.asarray(np.array(sorted(val), np.int32)),
        test_idx=jnp.asarray(np.array(sorted(test), np.int32)),
        num_classes=num_classes,
    )


def load_acm_gtn(path: str | None = None, seed: int = 0,
                 per_class_train: int = 200,
                 per_class_val: int = 100) -> StackedAdjData:
    """GTN input: dense [T, N, N] with slices PA, AP, PL, LP + identity over
    the union node set (GTN/utils/data_utils.py:129-150), 200/100-per-class
    splits (:117-126). ``path`` may be the reference's processed train.pkl
    or the raw ACM.mat."""
    if path is not None and os.path.exists(path):
        if path.endswith(".pkl"):
            return _load_gtn_pickle(path, seed, per_class_train,
                                    per_class_val)
        hg, feats, labels = _load_acm_mat(path)
    else:
        hg, feats, labels = synthetic_acm(seed=seed)

    np_, na, nl = (hg.node_counts["paper"], hg.node_counts["author"],
                   hg.node_counts["subject"])
    n = np_ + na + nl
    off_a, off_l = np_, np_ + na

    def dense(key, off_src, off_dst):
        s, d, _ = hg.relations[key]
        a = np.zeros((n, n), np.float32)
        a[s + off_src, d + off_dst] = 1.0
        return a

    slices = [
        dense(("paper", "pa", "author"), 0, off_a),
        dense(("author", "ap", "paper"), off_a, 0),
        dense(("paper", "pl", "subject"), 0, off_l),
        dense(("subject", "lp", "paper"), off_l, 0),
        np.eye(n, dtype=np.float32),    # identity slice (:148)
    ]
    adj = np.stack(slices, axis=0)

    full_feats = np.zeros((n, feats.shape[1]), np.float32)
    full_feats[:np_] = feats
    # author/subject one-hot-ish features: mean of their papers
    pa_s, pa_d, _ = hg.relations[("paper", "pa", "author")]
    np.add.at(full_feats, pa_d + off_a, feats[pa_s])
    pl_s, pl_d, _ = hg.relations[("paper", "pl", "subject")]
    np.add.at(full_feats, pl_d + off_l, feats[pl_s])

    rng = np.random.default_rng(seed)
    num_classes = int(labels.max()) + 1
    train, val, test = [], [], []
    for c in range(num_classes):
        idx = np.flatnonzero(labels == c)
        rng.shuffle(idx)
        k1 = min(per_class_train, max(len(idx) - 2, 1))
        k2 = min(per_class_val, max(len(idx) - k1 - 1, 0))
        train.extend(idx[:k1])
        val.extend(idx[k1:k1 + k2])
        test.extend(idx[k1 + k2:])
    return StackedAdjData(
        adj=jnp.asarray(adj),
        features=jnp.asarray(row_normalize_features(full_feats)),
        labels=jnp.asarray(labels),
        target_idx=jnp.arange(np_, dtype=jnp.int32),
        train_idx=jnp.asarray(np.array(sorted(train), np.int32)),
        val_idx=jnp.asarray(np.array(sorted(val), np.int32)),
        test_idx=jnp.asarray(np.array(sorted(test), np.int32)),
        num_classes=num_classes,
    )


def load_imdb_han(path: str | None = None, seed: int = 0,
                  layout: str = "coo",
                  min_edges_per_tile: int = 64) -> HeteroNodeData:
    """IMDB for HAN: MAM + MDM metapath graphs over movies.

    Structurally isomorphic to ACM (movie=paper, actor=author,
    director=subject); real IMDB .mat files are not distributed with the
    reference, so absent a path this synthesises IMDB-shaped data
    (3 classes: action/comedy/drama). ``layout`` as in load_acm_han."""
    if path is not None and os.path.exists(path):
        hg, feats, labels = _load_acm_mat(path)
    else:
        hg, feats, labels = synthetic_acm(
            n_papers=900, n_authors=500, n_subjects=60, n_feats=128,
            n_classes=3, seed=seed)
    return _assemble_han_data(hg, feats, labels, seed, layout,
                              min_edges_per_tile)


def load_imdb_gtn(path: str | None = None, seed: int = 0) -> StackedAdjData:
    """IMDB for GTN: [T, N, N] stack (MA/AM/MD/DM + identity) with
    per-class splits; accepts the reference's processed train.pkl."""
    if path is not None and os.path.exists(path) and path.endswith(".pkl"):
        return _load_gtn_pickle(path, seed, 300, 300)
    # synthetic IMDB shares the ACM union-graph construction
    return load_acm_gtn(path=None, seed=seed + 1000,
                        per_class_train=300, per_class_val=300)
