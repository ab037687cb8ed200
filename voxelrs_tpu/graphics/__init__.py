from .camera import Camera
from .registry import Material, VoxelRegistry
from .svo import RenderParams, Svo, Stats

__all__ = ["Camera", "Material", "RenderParams", "Stats", "Svo", "VoxelRegistry"]
