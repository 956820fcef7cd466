from .partition import (partition_mesh, halo_schedule_stats,
                        ShardedMeshBundle)
from .shard import ShardedFlow

__all__ = ["partition_mesh", "halo_schedule_stats", "ShardedMeshBundle",
           "ShardedFlow"]
