from .mesh import dense_batch_sharding, make_mesh, sparse_node_sharding

__all__ = ["dense_batch_sharding", "make_mesh", "sparse_node_sharding"]
