"""graphneuralnetwork_tpu — a TPU-native GNN message-passing framework.

Built from scratch in JAX/XLA/Pallas, covering the model family of the
reference repo ``kaddly/GraphNeuralNetwork`` (GCN, GAT, GraphSAGE, HAN, GTN,
MetaPath2Vec, GATNE, BiNE, DeepWalk, LINE, Node2vec, Struc2Vec, SDNE) with a
shared core instead of per-model scripts. See SURVEY.md for the map from
reference components to this package.
"""

__version__ = "0.1.0"

from . import core, ops  # noqa: F401
from .core.graph import Graph, build_graph, gcn_graph  # noqa: F401
