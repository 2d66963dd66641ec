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
    "build_sharded_bit_cycle",
    "build_sharded_cycle",
    "build_sharded_hier_probe",
    "build_sharded_list_collide",
    "build_sharded_paged_probe",
    "build_sharded_sensor_cycle",
    "make_grid_mesh",
    "sharded_collide_count",
]
