"""Render a few bench-scene frames with per-stage timing (VOXELRS_TIMING)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VOXELRS_TIMING", "1")

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402

W, H = 1920, 1080

world_svo, chunks, hf = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)
if os.environ.get("VOXELRS_BEAMS") != "0":
    svo.set_heightfield(hf)
print(f"world: {chunks} chunks depth {svo.depth}", flush=True)

fwd = np.array([0.55, -0.35, 0.76], np.float32)
fwd /= np.linalg.norm(fwd)
base = np.array([16.0, 95.0, -20.0], np.float32)

for i in range(int(os.environ.get("FRAMES", "4"))):
    p = RenderParams(
        cam_pos=base + np.array([2.0 * i, 0.0, 1.5 * i], np.float32),
        cam_fwd=fwd, aspect_ratio=W / H, fov_y_rad=np.radians(80.0),
        render_shadows=True, shadow_distance=300.0,
    )
    t0 = time.perf_counter()
    img = svo.render(p, W, H)
    _ = float(np.asarray(img[0, 0, 0]))
    print(f"frame {i}: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

# sync-method comparison (the bench's sequential path calls
# block_until_ready before the element readback — price both)
if os.environ.get("SYNC_PROBE") == "1":
    for trial in range(2):
        img = svo.render(p, W, H)
        t0 = time.perf_counter()
        img.block_until_ready()
        t_bur = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(img[0, 0, 0]))
        t_rd = time.perf_counter() - t0
        print(f"sync probe: block_until_ready {t_bur*1e3:.0f} ms, "
              f"then element readback {t_rd*1e3:.0f} ms", flush=True)
