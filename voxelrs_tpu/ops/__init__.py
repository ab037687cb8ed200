from .traversal import TraversalResult, intersect_octree

__all__ = ["TraversalResult", "intersect_octree"]
