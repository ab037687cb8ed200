"""Per-frame world orchestration: chunk streaming, generation, SVO upload,
physics hookup, render parameter assembly.

Mirrors reference: src/gamelogic/world.rs:28-283 — chunk-loader events are
frustum-prioritized, storage misses fall back to the generator, results
drain in ≤400-chunk batches, chunk ownership bounces world → serializer →
world via the borrow protocol, and benchmark mode defers SVO population
until all chunks are loaded (then serializes the whole world in one wave).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from .. import graphics
from ..graphics.camera import Camera
from ..graphics.svo import RenderParams
from ..systems import worldsvo
from ..systems.chunkloader import ChunkLoader
from ..systems.jobs import JobSystem
from ..systems.physics import Entity, Physics
from ..systems.storage import MinecraftStorage, NopStorage
from ..systems.worldgen import Generator as GeneratorDriver
from ..world import chunk as chunk_mod
from ..world.chunk import Chunk, ChunkPos, ChunkSlotPool
from ..world.world import World as ChunkMap
from . import benchmark, content, worldgen


class World:
    def __init__(
        self,
        job_system: JobSystem,
        fov_y_deg: float = 72.0,
        render_shadows: bool = True,
        loading_radius: int = 20,
        no_lod: bool = False,
        mc_world_path: Optional[str] = None,
        gpu_size_mb: float = 64.0,
        benchmark_mode: bool = False,
        texture_dir: Optional[str] = None,
        svo_format: str = "esvo",
    ):
        self.job_system = job_system
        self.chunk_loader = ChunkLoader(loading_radius, 0, 8)
        self.no_lod = no_lod
        self.slot_pool = ChunkSlotPool()
        self.benchmark_mode = benchmark_mode

        if mc_world_path:
            self.storage = MinecraftStorage(job_system, mc_world_path, self.slot_pool)
        else:
            self.storage = NopStorage()

        self.world = ChunkMap(storage_pool=self.slot_pool)
        self.world_generator_cfg = worldgen.default_config()
        self.world_generator = GeneratorDriver(
            job_system, worldgen.Generator(1, self.world_generator_cfg), self.slot_pool
        )

        import numpy as _np

        buffer_dtype = _np.uint32 if svo_format == "esvo" else _np.uint8
        graphics_svo = graphics.Svo(
            content.new_registry(texture_dir), gpu_size_mb, buffer_dtype
        )
        self.world_svo = worldsvo.Svo(
            job_system, graphics_svo, loading_radius, svo_format
        )

        self.physics = Physics()
        self.camera = Camera(fov_y_deg, 1.0, 0.01, 1024.0)
        self.selected_voxel: Optional[np.ndarray] = None
        self.ambient_intensity = 0.3
        self.sun_direction = np.array([-1.0, -1.0, -1.0], np.float32) / math.sqrt(3)
        self.render_shadows = render_shadows
        self.shadow_distance = 500.0

        self._started_rendering = False
        self._finished_rendering = False
        self._world_trace = None

    # -- per-frame ------------------------------------------------------------

    def update_fixed(self, entity: Entity, delta_time: float) -> None:
        self.physics.step(delta_time, self.world_svo, entity)

    def update(self, entity: Entity) -> None:
        self.camera.position = np.asarray(entity.position, np.float32)
        self.camera.forward = entity.get_forward()
        self.handle_chunk_loading()

    def handle_chunk_loading(self) -> None:
        events = self.chunk_loader.update(*self.camera.position)
        if events:
            events = self.sort_chunks_by_view_frustum(events, self.camera)
            for event in events:
                if event.kind == "load":
                    lod = 5 if self.no_lod else event.lod
                    self.storage.load(event.pos, lod)
                elif event.kind == "unload":
                    if hasattr(self.storage, "processor"):
                        self.storage.processor.dequeue(event.pos)
                    self.world_generator.dequeue_chunk(event.pos)
                    self.world.remove_chunk(event.pos)
                elif event.kind == "lod" and not self.no_lod:
                    chunk = self.world.get_chunk_mut(event.pos)
                    if chunk is not None:
                        chunk.lod = event.lod

        for result in self.storage.get_load_results(400):
            if not self.chunk_loader.is_loaded(result.pos):
                continue
            if result.chunk is None:
                self.world_generator.enqueue_chunk(result.pos, result.lod)
                continue
            self.world.set_chunk_unchanged(result.chunk)
            if not self.benchmark_mode:
                borrowed = self.world.borrow_chunk(result.pos)
                if borrowed is not None:
                    self.world_svo.set_chunk(borrowed)

        for chunk in self.world_generator.get_generated_chunks(400):
            if not self.chunk_loader.is_loaded(chunk.pos):
                continue
            self.world.set_chunk_unchanged(chunk)
            if not self.benchmark_mode:
                borrowed = self.world.borrow_chunk(chunk.pos)
                if borrowed is not None:
                    self.world_svo.set_chunk(borrowed)

        for pos in self.world.get_changed_chunks(400):
            chunk = self.world.get_chunk(pos)
            if chunk is not None:
                borrowed = self.world.borrow_chunk(pos)
                if borrowed is not None:
                    self.world_svo.set_chunk(borrowed)
            else:
                self.world_svo.remove_chunk(pos)

        current = ChunkPos.from_block_pos(
            int(math.floor(self.camera.position[0])),
            int(math.floor(self.camera.position[1])),
            int(math.floor(self.camera.position[2])),
        )
        for borrowed in self.world_svo.update(current):
            self.world.return_chunk(borrowed)

        if self.benchmark_mode:
            self._benchmark_hooks()

    def _benchmark_hooks(self) -> None:
        """End-detection for the in-game benchmark
        (reference: world.rs:212-230)."""
        if (
            not self._started_rendering
            and not self.storage.has_pending_jobs()
            and not self.world_generator.has_pending_jobs()
        ):
            self._started_rendering = True
            print("all chunks loaded")
            self.world.mark_all_chunks_as_changed()
            self._world_trace = benchmark.start_trace("serialize_world")

        if (
            self._started_rendering
            and not self._finished_rendering
            and not self.world.has_changed_chunks()
            and not self.world.has_borrowed_chunks()
            and not self.world_svo.has_pending_jobs()
        ):
            self._finished_rendering = True
            benchmark.stop_trace(self._world_trace)
            benchmark.reset_fps()

    @property
    def all_chunks_rendered(self) -> bool:
        return self._finished_rendering

    @staticmethod
    def sort_chunks_by_view_frustum(events, camera: Camera):
        """In-frustum chunks first; the rest sorted by angle to the camera
        forward vector (reference: world.rs:236-262)."""
        visible, other = [], []
        for evt in events:
            bx, by, bz = evt.pos.as_block_pos()
            center = np.array([bx + 16, by + 16, bz + 16], np.float32)
            if camera.is_in_frustum(center, 32.0):
                visible.append(evt)
            else:
                other.append(evt)

        cam_pos = camera.position
        fwd = camera.forward

        def angle_key(evt):
            bx, by, bz = evt.pos.as_block_pos()
            t = np.array([bx, by, bz], np.float32) - cam_pos
            n = np.linalg.norm(t)
            if n == 0:
                return -1.0
            return -float(np.dot(t / n, fwd))

        other.sort(key=angle_key)
        return visible + other

    def add_chunk(self, chunk: Chunk) -> None:
        self.chunk_loader.add_loaded_chunk(chunk.pos, chunk.lod)
        self.world.set_chunk(chunk)

    def reset_worldgen(self, cfg=None, seed: int = 1) -> None:
        """Live worldgen reconfiguration: drop every chunk and regenerate with
        the new config (the reference's world-gen debug window 'Generate'
        button, reference: gamelogic/world.rs:285-374)."""
        self.job_system.clear()
        if cfg is not None:
            self.world_generator_cfg = cfg
        self.world_generator = GeneratorDriver(
            self.job_system, worldgen.Generator(seed, self.world_generator_cfg),
            self.slot_pool,
        )
        for pos in list(self.world.chunks.keys()):
            self.world.remove_chunk(pos)
        self.chunk_loader.loaded_chunks.clear()
        self.chunk_loader.last_pos = None  # force reload next update

    # -- voxel edits (used by gameplay) ----------------------------------------

    def set_block(self, x: int, y: int, z: int, block: int) -> bool:
        changed = self.world.set_block(x, y, z, block)
        if not changed and block != chunk_mod.NO_BLOCK:
            # placing outside loaded chunks creates the chunk on the fly
            pos = ChunkPos.from_block_pos(x, y, z)
            chunk = Chunk(pos, 5, self.slot_pool.allocate())
            chunk.set_block(x & 31, y & 31, z & 31, block)
            self.add_chunk(chunk)
            return True
        return changed

    # -- render ------------------------------------------------------------------

    def render_params(self, aspect_ratio: float) -> RenderParams:
        return RenderParams(
            cam_pos=self.camera.position,
            cam_fwd=self.camera.forward,
            cam_up=self.camera.up,
            fov_y_rad=math.radians(self.camera.fov_y_deg),
            aspect_ratio=aspect_ratio,
            ambient_intensity=self.ambient_intensity,
            light_dir=self.sun_direction,
            render_shadows=self.render_shadows,
            shadow_distance=self.shadow_distance,
            selected_voxel=self.selected_voxel,
        )

    def render(self, width: int, height: int, max_steps: int = 1000,
               crosshair: bool = False):
        img = self.world_svo.render(
            self.render_params(width / height), width, height, max_steps
        )
        if crosshair:
            from ..ops.shading import crosshair_overlay

            img = crosshair_overlay(img)
        return img
