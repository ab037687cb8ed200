"""Warm pipelined frame cost for ONE config (env: SC_SHADOWS, SC_BEAMS).
Run one process per config — the sticky plan store is config-specific."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VOXELRS_FUSED_REPLAY", "1")

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402

W, H = 1920, 1080
shadows = os.environ.get("SC_SHADOWS", "1") == "1"
use_beams = os.environ.get("SC_BEAMS", "1") == "1"

world_svo, chunks, hf = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)
if use_beams:
    svo.set_heightfield(hf)

fwd = np.array([0.55, -0.35, 0.76], np.float32)
fwd /= np.linalg.norm(fwd)
base = np.array([16.0, 95.0, -20.0], np.float32)

times = []
frames = int(os.environ.get("SC_FRAMES", "14"))
for i in range(frames):
    p = RenderParams(
        cam_pos=base + np.array([2.0 * (i % 5), 0.0, 1.5 * (i % 5)],
                                np.float32),
        cam_fwd=fwd, aspect_ratio=W / H, fov_y_rad=np.radians(80.0),
        render_shadows=shadows, shadow_distance=300.0,
    )
    t0 = time.perf_counter()
    img = svo.render(p, W, H)
    _ = float(np.asarray(img[0, 0, 0]))
    times.append((time.perf_counter() - t0) * 1e3)
tail = times[-5:]
print(f"shadows={int(shadows)} beams={int(use_beams)}: "
      f"med-tail {np.median(tail):.0f} ms min {min(tail):.0f} ms "
      f"all {[f'{t:.0f}' for t in times]}", flush=True)
