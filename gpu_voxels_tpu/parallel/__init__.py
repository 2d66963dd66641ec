from .paged_world import ShardedPagedWorld
from .shard_value import assert_sharded, reshard_like, shard_map_value
from .sharded import (
    build_sharded_bit_cycle,
    build_sharded_cycle,
    build_sharded_hier_probe,
    build_sharded_list_collide,
    build_sharded_paged_probe,
    build_sharded_sensor_cycle,
    make_grid_mesh,
    sharded_collide_count,
)

__all__ = [
    "ShardedPagedWorld",
    "assert_sharded",
    "build_sharded_bit_cycle",
    "build_sharded_cycle",
    "build_sharded_hier_probe",
    "build_sharded_list_collide",
    "build_sharded_paged_probe",
    "build_sharded_sensor_cycle",
    "make_grid_mesh",
    "reshard_like",
    "shard_map_value",
    "sharded_collide_count",
]
