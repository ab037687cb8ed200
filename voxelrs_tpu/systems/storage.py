"""World persistence: the Storage protocol plus NopStorage (regenerate
everything) and MinecraftStorage (read-only Anvil `.mca` world import).
Mirrors reference: src/systems/storage.rs:13-173. World *saving* does not
exist in the reference either (its README lists it as future work)."""

from __future__ import annotations

from typing import Optional, Protocol

from ..world.chunk import Chunk, ChunkPos, ChunkSlotPool
from .jobs import ChunkProcessor, JobSystem


class Storage(Protocol):
    def load(self, pos: ChunkPos, lod: int) -> None: ...

    def get_load_results(self, limit: int) -> list["LoadResult"]: ...

    def has_pending_jobs(self) -> bool: ...


class LoadResult:
    """Either a loaded chunk or a miss (miss → the generator takes over)."""

    __slots__ = ("pos", "lod", "chunk")

    def __init__(self, pos: ChunkPos, lod: int, chunk: Optional[Chunk]):
        self.pos = pos
        self.lod = lod
        self.chunk = chunk


class NopStorage:
    """Persistence disabled: every load misses so chunks regenerate
    (reference: storage.rs:20-48)."""

    def __init__(self) -> None:
        self._pending: list[LoadResult] = []

    def load(self, pos: ChunkPos, lod: int) -> None:
        self._pending.append(LoadResult(pos, lod, None))

    def get_load_results(self, limit: int) -> list[LoadResult]:
        out = self._pending[:limit]
        del self._pending[: len(out)]
        return out

    def has_pending_jobs(self) -> bool:
        return bool(self._pending)


_ANVIL_CACHE: dict = {}


class MinecraftStorage:
    """Loads chunks from a Minecraft Anvil world directory
    (reference: storage.rs:58-160): 2×2 MC chunks (16-block columns) map to
    one 32³ chunk; block names map to our BlockIds."""

    def __init__(self, job_system: JobSystem, path: str,
                 slot_pool: ChunkSlotPool | None = None):
        import os

        from ..utils.mcanvil import AnvilWorld

        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"--mc-world path {path!r} is not a directory; expected a "
                "Minecraft Anvil world folder containing r.X.Z.mca files"
            )
        # AnvilWorld is read-only after construction (decoded sections are
        # memoized); share one instance per path so sequential Game
        # instances in the same process (the benchmark matrix) don't
        # re-parse and re-decode the world per config
        key = os.path.realpath(path)
        if key not in _ANVIL_CACHE:
            _ANVIL_CACHE[key] = AnvilWorld(path)
        self.world = _ANVIL_CACHE[key]
        # dropped (cancelled/stale) load results own a pool slot
        self.processor: ChunkProcessor[LoadResult] = ChunkProcessor(
            job_system, on_drop=self._reclaim_dropped)
        self.slot_pool = slot_pool or ChunkSlotPool()

    def _reclaim_dropped(self, res) -> None:
        chunk = getattr(res, "chunk", None)
        if chunk is not None and chunk.voxels is not None:
            self.slot_pool.release(chunk.voxels)

    def load(self, pos: ChunkPos, lod: int) -> None:
        def produce() -> LoadResult:
            voxels = self.world.read_chunk_voxels(pos.x, pos.y, pos.z)
            # Always a chunk (possibly empty) — the generator never runs for
            # MC worlds (reference: storage.rs:157-158 returns Some(chunk)
            # even when the area holds no blocks).
            chunk = Chunk(pos, lod, self.slot_pool.allocate())
            if voxels is not None:
                chunk.voxels[:] = voxels
            return LoadResult(pos, lod, chunk)

        self.processor.enqueue(pos, False, produce)

    def get_load_results(self, limit: int) -> list[LoadResult]:
        return [r.value for r in self.processor.get_results(limit)]

    def has_pending_jobs(self) -> bool:
        return self.processor.has_pending()
