"""Graph-analysis demo — the reference's Basis/networkx_study.py:11-31
walkthrough (degree, connected components, diameter, degree/eigenvector/
betweenness/closeness centrality, pagerank, HITS) on the same 10-node
graph, computed by this package's MXU-based kernels instead of networkx.

Run: ``python -m graphneuralnetwork_tpu.analysis.demo``
"""

from __future__ import annotations

import numpy as np

from . import centrality as C


def basis_demo() -> dict:
    # The Basis demo's edge list (both directions listed explicitly).
    src = [0, 1, 2, 3, 4, 4, 6, 7, 7, 9, 1, 4, 4, 4, 6, 7, 5, 8, 9, 8]
    dst = [1, 4, 4, 4, 6, 7, 5, 8, 9, 8, 0, 1, 2, 3, 4, 4, 6, 7, 7, 9]
    n = 10
    a = np.zeros((n, n), np.float32)
    a[src, dst] = 1.0
    a = np.maximum(a, a.T)

    hubs, auths = C.hits(a)
    out = {
        "degree": (a > 0).sum(1).tolist(),
        "connected_components": np.asarray(
            C.connected_components(a)).tolist(),
        "diameter": C.diameter(a),
        "degree_centrality": np.asarray(C.degree_centrality(a)).tolist(),
        "eigenvector_centrality": np.asarray(
            C.eigenvector_centrality(a)).tolist(),
        "betweenness": np.asarray(C.betweenness_centrality(a)).tolist(),
        "closeness": np.asarray(C.closeness_centrality(a)).tolist(),
        "pagerank": np.asarray(C.pagerank(a)).tolist(),
        "hits_hubs": np.asarray(hubs).tolist(),
        "hits_authorities": np.asarray(auths).tolist(),
    }
    return out


if __name__ == "__main__":
    for k, v in basis_demo().items():
        print(f"{k}: {v}")
