from .sharded import build_sharded_cycle, make_grid_mesh, sharded_collide_count

__all__ = ["build_sharded_cycle", "make_grid_mesh", "sharded_collide_count"]
