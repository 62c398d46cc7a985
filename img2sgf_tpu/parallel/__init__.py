from .mesh import aggregate_metrics, data_mesh, make_sharded_detector, shard_batch

__all__ = ["aggregate_metrics", "data_mesh", "make_sharded_detector", "shard_batch"]
