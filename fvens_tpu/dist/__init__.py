from .partition import partition_mesh, ShardedMeshBundle
from .shard import ShardedFlow

__all__ = ["partition_mesh", "ShardedMeshBundle", "ShardedFlow"]
