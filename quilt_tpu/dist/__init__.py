from .mesh import make_mesh, fb_full_sharded

__all__ = ["make_mesh", "fb_full_sharded"]
