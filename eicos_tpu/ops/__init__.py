from .ldl import ldl_factor, ldl_solve, pad_to_block

__all__ = ["ldl_factor", "ldl_solve", "pad_to_block"]
