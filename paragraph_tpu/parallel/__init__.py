from .mesh import make_mesh, sharded_full_step

__all__ = ["make_mesh", "sharded_full_step"]
