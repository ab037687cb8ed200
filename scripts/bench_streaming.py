"""Fly-through-WHILE-STREAMING benchmark: frame rate under chunk churn.

The headline bench (bench.py) times a static world. This run keeps the
world moving the way real play does: every frame the camera advances and
the leading edge of the terrain streams IN (generate -> serialize ->
Esvo.set_leaf -> delta upload) while the trailing edge streams OUT
(remove_leaf), exercising the serializer, the RangeBuffer delta ranges,
``Svo.update``'s dynamic_update_slice uploads and the heightfield/beam
bookkeeping in the same loop as rendering.

Prints ONE JSON line mirroring bench.py's schema:
  {"metric": "Mrays_per_sec_chip_1080p_shadows_streaming", ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.gamelogic.worldgen import Generator, default_config  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402
from voxelrs_tpu.systems.chunkloader import ChunkLoader  # noqa: E402
from voxelrs_tpu.world import ChunkPos, Position  # noqa: E402
from voxelrs_tpu.world.chunk import Chunk  # noqa: E402
from voxelrs_tpu.world.esvo import SerializedChunk  # noqa: E402
from voxelrs_tpu.world.heightfield import (  # noqa: E402
    chunk_column_tops,
    chunk_solid_bases,
    chunk_voxel_tops,
    opaque_lut_from_mask,
)

BASELINE_MRAYS = 250.0
W = int(os.environ.get("BENCH_W", "1920"))
H = int(os.environ.get("BENCH_H", "1080"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
RADIUS = 4
OUT_JSON = os.environ.get(
    "BENCH_OUT", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "streaming_r4.json"))


def main() -> None:
    from voxelrs_tpu.world.esvo import Esvo
    from voxelrs_tpu.world.heightfield import HeightField

    svo = Svo(new_registry(), capacity_mb=64)
    opaque_lut = opaque_lut_from_mask(svo.translucent_block_mask)
    world_svo = Esvo()
    hf = HeightField()
    # production setting (systems/worldsvo.py): sun-certificate builds run
    # on a worker thread. The r3 streaming run that left this at the
    # synchronous default paid a multi-second host sun build EVERY churn
    # frame (the map version changes each frame, the 0.75 s cooldown
    # expires within one >1 s frame) — p50 3.2 s. Under churn the async
    # quiet gate simply skips the build and shadow rays trace.
    hf.sun_async = True
    hf.reserve(RADIUS * 4)  # wrapped-window span: envelope shapes constant
    gen = Generator(1, default_config())
    center = ChunkPos(RADIUS, 2, RADIUS)
    leafs: dict = {}  # (cx, cz) -> [(LeafId, chunk_pos)]

    def stream_column(cx: int, cz: int):
        """Generate + serialize one chunk column at the leading edge."""
        col = gen.get_column(cx, cz)
        lod = ChunkLoader.calculate_lod(center, ChunkPos(cx, 0, cz))
        ids = []
        for cy in range(0, 8):
            if not col.contains_chunk(cy):
                continue
            chunk = Chunk(ChunkPos(cx, cy, cz))
            gen.generate_chunk(chunk)
            sc = SerializedChunk.from_voxels(chunk.pos, chunk.voxels, lod)
            if not sc.has_data():
                continue
            lid, _ = world_svo.set_leaf(Position(cx, cy, cz), sc, True)
            ids.append((lid, (cx, cy, cz)))
            hf.set_chunk((cx, cy, cz),
                         chunk_column_tops(chunk.voxels, lod),
                         vtops=chunk_voxel_tops(chunk.voxels, lod),
                         sbase=chunk_solid_bases(chunk.voxels, lod,
                                                 opaque_lut))
        leafs[(cx, cz)] = ids

    def drop_column(cx: int, cz: int):
        for lid, cpos in leafs.pop((cx, cz), []):
            world_svo.remove_leaf(lid)
            hf.remove_chunk(cpos)

    # initial world: the same seed-1 region bench.py uses, ids tracked
    for cx in range(RADIUS * 2):
        for cz in range(RADIUS * 2):
            stream_column(cx, cz)
    world_svo.serialize()
    svo.update(world_svo)
    svo.set_heightfield(hf)
    n_chunks = sum(len(v) for v in leafs.values())
    print(f"# world: {n_chunks} chunks, {svo.stats.used_bytes/1e6:.1f} MB",
          file=sys.stderr)

    fwd = np.array([0.55, -0.35, 0.76], np.float32)
    fwd /= np.linalg.norm(fwd)
    base = RenderParams(
        cam_pos=np.array([16.0, 95.0, -20.0], np.float32),
        cam_fwd=fwd,
        aspect_ratio=W / H,
        fov_y_rad=np.radians(80.0),
        render_shadows=True,
        shadow_distance=300.0,
    )
    cam = np.array(base.cam_pos, np.float32)

    next_in = RADIUS * 2  # next x column index to stream in
    next_out = 0          # next x column index to drop

    # The real streaming engine recenters chunk positions on camera
    # movement (systems/worldsvo.py shift_chunks), so SVO positions —
    # and with them the octree depth, the buffer ladder step and the
    # envelope span — stay BOUNDED during play. The bench models that
    # with a wrapped column window (span 2x the live width, so in/out
    # never collide); without it the ever-growing x deepens the octree
    # and crosses envelope pow2 spans mid-measurement, recompiling
    # programs the real engine's steady state never would.
    SPAN = RADIUS * 4

    def frame(i: int, churn: bool, log: bool = False):
        nonlocal next_in, next_out
        t0 = time.time()
        if churn:
            # one column in, one out, per frame: ~8 chunks churned —
            # the chunkloader's steady-state rate at walking speed
            for cz in (i % (RADIUS * 2),):
                stream_column(next_in % SPAN, cz)
                drop_column(next_out % SPAN, cz)
            if i % (RADIUS * 2) == RADIUS * 2 - 1:
                next_in += 1
                next_out += 1
            world_svo.serialize()
            t1 = time.time()
            svo.update(world_svo)
            svo.set_heightfield(hf)
        else:
            t1 = time.time()
        t2 = time.time()
        p = RenderParams(**{**base.__dict__})
        p.cam_pos = cam + np.array(
            [2.0 * (i % (RADIUS * 2)), 0.0, 1.5 * (i % (RADIUS * 2))],
            np.float32)
        img = svo.render(p, W, H)
        _ = float(np.asarray(img[0, 0, 0]))
        if log:
            print(f"#   frame {i}: stream+ser {t1-t0:.3f} s, upload "
                  f"{t2-t1:.3f} s, render {time.time()-t2:.3f} s",
                  file=sys.stderr)

    # warmup until the churn plan shapes settle: static frames first so
    # buckets form, then churn frames until 3 consecutive land within 2x
    # of the best churn frame seen (under async fused compiles the
    # background worker keeps swapping faster programs in; the window
    # closes once nothing new is compiling)
    t_w = time.time()
    for i in range(3):
        frame(i, churn=False)
    wtimes = []
    i = 3
    while True:
        t0 = time.time()
        frame(i, churn=True)
        wtimes.append(time.time() - t0)
        i += 1
        # steady state = one full wrap cycle absorbed (every plan/bucket
        # shape the churn can produce has appeared) AND the last 8 churn
        # frames are all within 2x of the best — a single slow frame here
        # is a compile still landing, so keep warming
        if (len(wtimes) >= 2 * RADIUS * 2
                and max(wtimes[-8:]) < 2.0 * min(wtimes)):
            break
        if len(wtimes) >= 48 or time.time() - t_w > 1800:
            break
    print(f"# warmup {time.time()-t_w:.1f} s ({len(wtimes)} churn frames)",
          file=sys.stderr)

    times = []
    for i in range(i, i + FRAMES):
        t0 = time.time()
        frame(i, churn=True, log=True)
        times.append(time.time() - t0)
    dt = float(np.mean(times))
    p50 = float(np.percentile(times, 50))
    p99 = float(np.percentile(times, 99))
    mrays = W * H * 2 / dt / 1e6
    print(f"# streaming frame: mean {dt*1e3:.0f} ms, p50 {p50*1e3:.0f} ms, "
          f"p99 {p99*1e3:.0f} ms", file=sys.stderr)
    out = {
        "metric": "Mrays_per_sec_chip_1080p_shadows_streaming",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "frame_ms_p50": round(p50 * 1e3, 1),
        "frame_ms_p99": round(p99 * 1e3, 1),
        "frames": FRAMES,
        "async_compile": os.environ.get("VOXELRS_ASYNC_COMPILE", "1"),
        "frame_ms_all": [round(t * 1e3, 1) for t in times],
    }
    try:
        json.dump(out, open(OUT_JSON, "w"), indent=1)
    except OSError:
        pass
    print(json.dumps({k: v for k, v in out.items()
                      if k != "frame_ms_all"}))


if __name__ == "__main__":
    main()
