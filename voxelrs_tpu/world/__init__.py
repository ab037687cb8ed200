from .chunk import BlockPos, Chunk, ChunkPos, NO_BLOCK
from .octree import LeafId, Octree, Position
from .world import BorrowedChunk, World

__all__ = [
    "BlockPos",
    "BorrowedChunk",
    "Chunk",
    "ChunkPos",
    "LeafId",
    "NO_BLOCK",
    "Octree",
    "Position",
    "World",
]
