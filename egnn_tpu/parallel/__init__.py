from .distributed import (
    MetricLogger,
    initialize,
    is_coordinator,
    log0,
    sync_global_devices,
)
from .mesh import dense_batch_sharding, make_mesh, sparse_node_sharding
from .pipeline import (make_pipelined_apply, make_pipelined_loss,
                       pipeline_apply, pipeline_loss, stack_layer_params,
                       to_stages)
from .ring import ring_pairwise
from .tp import make_tp_mesh, tp_param_sharding, tp_param_spec
from .sparse_partition import (PartitionedEdges, partition_edges,
                               partition_uniform_edges)

__all__ = [
    "MetricLogger",
    "initialize",
    "is_coordinator",
    "log0",
    "sync_global_devices",
    "dense_batch_sharding",
    "make_mesh",
    "sparse_node_sharding",
    "ring_pairwise",
    "make_pipelined_apply",
    "make_pipelined_loss",
    "pipeline_apply",
    "pipeline_loss",
    "stack_layer_params",
    "to_stages",
    "PartitionedEdges",
    "partition_edges",
    "make_tp_mesh",
    "tp_param_sharding",
    "tp_param_spec",
    "partition_uniform_edges",
]
