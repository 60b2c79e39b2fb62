from .alias import (  # noqa: F401
    CachedWeightedSampler,
    ConcatAliasTables,
    build_alias_table,
    sample_alias,
)
from .neighbor import multihop_sampling, sample_neighbors  # noqa: F401
from .skipgram import (  # noqa: F401
    NegativeSampler,
    batchify,
    centers_and_contexts,
    minibatches,
    skipgram_dataset,
    subsample,
)
from .walks import (  # noqa: F401
    Node2VecWalker,
    bine_walks,
    csr_from_edges,
    metapath_walks,
    uniform_walks,
    weighted_walks,
)
