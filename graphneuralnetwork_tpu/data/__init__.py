from .acm import (  # noqa: F401
    HeteroNodeData,
    StackedAdjData,
    load_acm_gtn,
    load_acm_han,
    synthetic_acm,
)
from .planetoid import (  # noqa: F401
    NodeClassificationData,
    load_cora,
    synthetic_citation_graph,
)
