from .graph import (  # noqa: F401
    EDGE_BLOCK,
    Graph,
    add_self_loops,
    build_graph,
    csr_offsets,
    dense_adj,
    gcn_graph,
    row_normalize_features,
    row_normalize_weights,
    sym_normalize_weights,
    symmetrize,
)
from .hetero import BipartiteGraph, HeteroGraph, Vocab  # noqa: F401
