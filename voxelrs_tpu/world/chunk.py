"""Chunks and coordinate-space math.

A chunk is a group of 32^3 voxels. Unlike the reference — which stores chunk
contents as a pointer octree (reference: src/world/chunk.rs:94-131) — the
TPU-native representation is a dense ``(32, 32, 32)`` uint32 array indexed
``[z, y, x]`` is avoided; we index ``[x, y, z]`` to keep the idx = x + 2y + 4z
child-order convention readable. Dense arrays batch onto the device and feed
the vectorized ESVO serializer directly.

``ChunkPos``/``BlockPos`` semantics (including negative-coordinate handling)
mirror reference: src/world/chunk.rs:137-297.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

BlockId = int
NO_BLOCK: BlockId = 0

CHUNK_SIZE = 32
CHUNK_DEPTH = 5  # log2(32)


@dataclass(frozen=True, order=True)
class ChunkPos:
    """A chunk's position in world space; 1 chunk unit = 32 block units."""

    x: int
    y: int
    z: int

    @staticmethod
    def from_block_pos(x: int, y: int, z: int) -> "ChunkPos":
        return ChunkPos(x >> 5, y >> 5, z >> 5)

    def dst_sq(self, other: "ChunkPos") -> float:
        dx = float(other.x - self.x)
        dy = float(other.y - self.y)
        dz = float(other.z - self.z)
        return dx * dx + dy * dy + dz * dz

    def dst_2d_sq(self, other: "ChunkPos") -> float:
        dx = float(other.x - self.x)
        dz = float(other.z - self.z)
        return dx * dx + dz * dz

    def as_block_pos(self) -> tuple[int, int, int]:
        return (self.x << 5, self.y << 5, self.z << 5)

    def __sub__(self, other: "ChunkPos") -> "ChunkPos":
        return ChunkPos(self.x - other.x, self.y - other.y, self.z - other.z)


@dataclass
class BlockPos:
    """A block position split into the containing chunk plus fractional
    chunk-relative coordinates. x=-1 maps to rel_x=31 in chunk (-1,..)."""

    chunk: ChunkPos
    rel_x: float
    rel_y: float
    rel_z: float

    @staticmethod
    def new(x: int, y: int, z: int) -> "BlockPos":
        return BlockPos(
            ChunkPos.from_block_pos(x, y, z),
            float(x & 31),
            float(y & 31),
            float(z & 31),
        )

    @staticmethod
    def from_point(px: float, py: float, pz: float) -> "BlockPos":
        x, y, z = math.floor(px), math.floor(py), math.floor(pz)
        fx, fy, fz = px - math.trunc(px), py - math.trunc(py), pz - math.trunc(pz)
        if fx != 0.0 and px < 0.0:
            fx += 1.0
        if fy != 0.0 and py < 0.0:
            fy += 1.0
        if fz != 0.0 and pz < 0.0:
            fz += 1.0
        return BlockPos(
            ChunkPos.from_block_pos(x, y, z),
            float(x & 31) + fx,
            float(y & 31) + fy,
            float(z & 31) + fz,
        )

    def to_point(self) -> tuple[float, float, float]:
        bx, by, bz = self.chunk.as_block_pos()
        bx |= int(self.rel_x) & 31
        by |= int(self.rel_y) & 31
        bz |= int(self.rel_z) & 31
        return (
            float(bx) + (self.rel_x - math.trunc(self.rel_x)),
            float(by) + (self.rel_y - math.trunc(self.rel_y)),
            float(bz) + (self.rel_z - math.trunc(self.rel_z)),
        )


class Chunk:
    """32^3 voxels as a dense uint32 array, indexed ``voxels[x, y, z]``.

    ``lod`` is the maximum octree depth used when serializing (5 = full
    detail), mirroring reference: src/world/chunk.rs:96-98.
    """

    __slots__ = ("pos", "lod", "voxels")

    def __init__(self, pos: ChunkPos, lod: int = CHUNK_DEPTH, voxels=None):
        self.pos = pos
        self.lod = lod
        if voxels is None:
            voxels = np.zeros((CHUNK_SIZE, CHUNK_SIZE, CHUNK_SIZE), dtype=np.uint32)
        self.voxels = voxels

    def get_block(self, x: int, y: int, z: int) -> BlockId:
        return int(self.voxels[x, y, z])

    def set_block(self, x: int, y: int, z: int, block: BlockId) -> None:
        self.voxels[x, y, z] = block

    def fill_with(self, f) -> None:
        """Fill every voxel from ``f(x, y, z) -> Optional[BlockId]``.

        Prefer assigning ``self.voxels`` from a vectorized expression; this
        scalar path exists for parity with small tests
        (reference: src/world/chunk.rs:126-130).
        """
        self.voxels.fill(NO_BLOCK)
        for z in range(CHUNK_SIZE):
            for y in range(CHUNK_SIZE):
                for x in range(CHUNK_SIZE):
                    v = f(x, y, z)
                    if v is not None:
                        self.voxels[x, y, z] = v

    def is_empty(self) -> bool:
        return not self.voxels.any()


class ChunkSlotPool:
    """Free-list pool of dense chunk-voxel arrays with byte accounting.

    The TPU-native analogue of the reference's pooled octree storages +
    StatsAllocator (reference: src/world/memory.rs:16-189,
    src/world/chunk.rs:16-51): instead of allocator hooks, chunk storage is a
    pool of fixed-size numpy arrays handed out by index.
    """

    def __init__(self) -> None:
        self._free: list[np.ndarray] = []
        self._issued: set[int] = set()  # id() of arrays currently handed out
        self._allocated = 0
        self._used = 0

    def allocate(self) -> np.ndarray:
        self._used += 1
        if self._free:
            arr = self._free.pop()
            arr.fill(NO_BLOCK)
        else:
            self._allocated += 1
            arr = np.zeros((CHUNK_SIZE, CHUNK_SIZE, CHUNK_SIZE), dtype=np.uint32)
        self._issued.add(id(arr))
        # arrays dropped without release() (orphaned results) must not
        # leave their id in _issued — a later id() collision would admit
        # a foreign array into the free list
        import weakref

        weakref.finalize(arr, self._issued.discard, id(arr))
        return arr

    def release(self, arr: np.ndarray) -> None:
        """Return an array to the free list. Arrays not handed out by this
        pool (e.g. chunks built directly in tests) are ignored, keeping the
        accounting exact (reference: src/world/memory.rs:16-117 — pooled
        storages return to the allocator on chunk drop)."""
        if id(arr) not in self._issued:
            return
        self._issued.discard(id(arr))
        self._used -= 1
        self._free.append(arr)

    def clear(self) -> None:
        self._free.clear()
        self._allocated = self._used
        # bytes for still-used arrays remain accounted

    def used_count(self) -> int:
        return self._used

    def allocated_count(self) -> int:
        return self._allocated

    def allocated_bytes(self) -> int:
        return self._allocated * CHUNK_SIZE**3 * 4
