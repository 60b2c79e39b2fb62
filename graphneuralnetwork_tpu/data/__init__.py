from .acm import (  # noqa: F401
    HeteroNodeData,
    StackedAdjData,
    load_acm_gtn,
    load_acm_han,
    load_imdb_gtn,
    load_imdb_han,
    synthetic_acm,
)
from .edgelist import (  # noqa: F401
    EdgeListData,
    MultiplexData,
    load_edgelist,
    load_multiplex,
)
from .jdata import JData, load_jdata, process_jdata  # noqa: F401
from .pubmed import load_pubmed  # noqa: F401
from .planetoid import (  # noqa: F401
    NodeClassificationData,
    load_citeseer,
    load_cora,
    synthetic_citation_graph,
)
