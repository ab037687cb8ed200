"""CSVO-vs-ESVO 1080p frame time on the bench scene (VERDICT: CSVO within
~2x of ESVO via the shared deferred/adaptive pipeline)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np

from bench import build_world
from voxelrs_tpu.gamelogic.content import new_registry
from voxelrs_tpu.gamelogic.worldgen import Generator, default_config
from voxelrs_tpu.graphics.svo import RenderParams, Svo
from voxelrs_tpu.systems.chunkloader import ChunkLoader
from voxelrs_tpu.world import ChunkPos, Position
from voxelrs_tpu.world.chunk import Chunk
from voxelrs_tpu.world.csvo import Csvo, CsvoSerializedChunk

W, H = 1920, 1080


def build_world_csvo(radius: int = 4):
    gen = Generator(1, default_config())
    svo = Csvo()
    center = ChunkPos(radius, 2, radius)
    count = 0
    for cx in range(radius * 2):
        for cz in range(radius * 2):
            col = gen.get_column(cx, cz)
            lod = ChunkLoader.calculate_lod(center, ChunkPos(cx, 0, cz))
            for cy in range(0, 8):
                if not col.contains_chunk(cy):
                    continue
                chunk = Chunk(ChunkPos(cx, cy, cz))
                gen.generate_chunk(chunk)
                sc = CsvoSerializedChunk.from_voxels(chunk.pos, chunk.voxels, lod)
                if not sc.has_data():
                    continue
                svo.set_leaf(Position(cx, cy, cz), sc, True)
                count += 1
    svo.serialize()
    return svo, count


def run(svo, label):
    fwd = np.array([0.55, -0.35, 0.76], np.float32)
    fwd /= np.linalg.norm(fwd)
    base = np.array([16.0, 95.0, -20.0], np.float32)

    def frame(i):
        p = RenderParams(
            cam_pos=base + np.array([2.0 * (i % 5), 0.0, 1.5 * (i % 5)], np.float32),
            cam_fwd=fwd, aspect_ratio=W / H, fov_y_rad=np.radians(80.0),
            render_shadows=True, shadow_distance=300.0,
        )
        return svo.render(p, W, H)

    for i in range(12):
        img = frame(i)
        _ = float(np.asarray(img[0, 0, 0]))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        img = frame(i)
        _ = float(np.asarray(img[0, 0, 0]))
        ts.append(time.perf_counter() - t0)
    med = np.median(ts) * 1e3
    print(f"{label}: median frame {med:.0f} ms "
          f"({W*H*2/np.median(ts)/1e6:.2f} Mrays/s)", flush=True)
    return med


which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("esvo", "both"):
    world, n = build_world()
    svo = Svo(new_registry(), capacity_mb=64)
    svo.update(world)
    print(f"# esvo world: {n} chunks, {svo.stats.used_bytes/1e6:.1f} MB", flush=True)
    run(svo, "esvo")
if which in ("csvo", "both"):
    world, n = build_world_csvo()
    svo = Svo(new_registry(), capacity_mb=64, buffer_dtype=np.uint8)
    svo.update(world)
    print(f"# csvo world: {n} chunks, {svo.stats.used_bytes/1e6:.1f} MB", flush=True)
    run(svo, "csvo")
