"""Adaptive-vs-exact image diff at bench resolution on the live device."""

import os
import sys

sys.path.insert(0, "/root/repo")
from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402

W, H = 1920, 1080

world_svo, chunks = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)

fwd = np.array([0.55, -0.35, 0.76], np.float32)
fwd /= np.linalg.norm(fwd)
p = RenderParams(
    cam_pos=np.array([16.0, 95.0, -20.0], np.float32), cam_fwd=fwd,
    aspect_ratio=W / H, fov_y_rad=np.radians(80.0),
    render_shadows=True, shadow_distance=300.0,
)

os.environ["VOXELRS_ADAPTIVE"] = "0"
exact = np.asarray(svo.render(p, W, H))
os.environ["VOXELRS_ADAPTIVE"] = "1"
adaptive = np.asarray(svo.render(p, W, H))

d = np.abs(adaptive.astype(np.float64) - exact.astype(np.float64))
per_pixel = d.max(axis=-1)
print(f"mean abs diff: {d.mean():.6f}")
print(f"pixels differing >1e-3: {(per_pixel > 1e-3).mean()*100:.3f}%")
print(f"pixels differing >0.1:  {(per_pixel > 0.1).mean()*100:.4f}%")
print(f"max pixel diff: {per_pixel.max():.4f}")
