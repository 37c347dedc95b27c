from .sharding import make_mesh, solve_batch_sharded

__all__ = ["make_mesh", "solve_batch_sharded"]
