"""Warm per-stage timing on the bench scene's converged 5-pose loop.

Warms plans/compiles with timing OFF (12+ frames over the same poses the
headline bench uses), then re-renders the poses with VOXELRS_TIMING=1 so
every stage boundary is hard-synced (readback). Each stage number includes
one ~26 ms tunnel sync; subtract that per stage for device-only cost.
"""

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

world_svo, chunks, hf = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)
if os.environ.get("VOXELRS_BEAMS") != "0":
    svo.set_heightfield(hf)

fwd = np.array([0.55, -0.35, 0.76], np.float32)
fwd /= np.linalg.norm(fwd)
base = np.array([16.0, 95.0, -20.0], np.float32)


def render(i):
    p = RenderParams(
        cam_pos=base + np.array([2.0 * (i % 5), 0.0, 1.5 * (i % 5)],
                                np.float32),
        cam_fwd=fwd, aspect_ratio=W / H, fov_y_rad=np.radians(80.0),
        render_shadows=os.environ.get("SHADOWS", "1") == "1",
        shadow_distance=300.0,
    )
    return svo.render(p, W, H)


os.environ["VOXELRS_TIMING"] = "0"
for i in range(int(os.environ.get("WARMUP", "14"))):
    t0 = time.perf_counter()
    img = render(i)
    _ = float(np.asarray(img[0, 0, 0]))
    print(f"warm {i}: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

os.environ["VOXELRS_TIMING"] = "1"
for i in range(int(os.environ.get("FRAMES", "3"))):
    t0 = time.perf_counter()
    img = render(i)
    _ = float(np.asarray(img[0, 0, 0]))
    print(f"timed frame {i}: {(time.perf_counter()-t0)*1e3:.0f} ms",
          flush=True)
