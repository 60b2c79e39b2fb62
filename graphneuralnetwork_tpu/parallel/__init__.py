from .sharded import (  # noqa: F401
    ShardedGraph,
    aggregate_sharded,
    partition_graph,
    shard_nodes,
    spmm_sharded,
)
