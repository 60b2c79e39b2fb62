from .conv import GATConv, GCNConv, SAGEConv  # noqa: F401
from .gtn import GTN, GTConv, GTLayer  # noqa: F401
from .han import HAN, HANLayer, SemanticAttention  # noqa: F401
from .models import GAT, GCN, GraphSAGE  # noqa: F401
