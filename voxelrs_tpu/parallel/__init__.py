from .mesh import make_ray_mesh, render_frame_sharded

__all__ = ["make_ray_mesh", "render_frame_sharded"]
