"""Host-side cost of one warm fused frame (cProfile over svo.render).

The fused-frame stage-cut probe shows a ~73 ms per-frame floor of which
~26 ms is the tunnel readback sync — this names the other ~45 ms of host
orchestration (plan snapshot hashing? arg marshalling? python overhead?).
Run on the TPU; the profile is host-only so it does not disturb device
numbers (but run it alone on this one-CPU box).
"""

import cProfile
import io
import os
import pstats
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
svo.set_heightfield(hf)

fwd = np.array([0.55, -0.35, 0.76], np.float32)
fwd /= np.linalg.norm(fwd)
base = np.array([16.0, 95.0, -20.0], np.float32)


def render(i):
    p = RenderParams(
        cam_pos=base + np.array([2.0 * (i % 5), 0.0, 1.5 * (i % 5)],
                                np.float32),
        cam_fwd=fwd, aspect_ratio=W / H, fov_y_rad=np.radians(80.0),
        render_shadows=True, shadow_distance=300.0,
    )
    return svo.render(p, W, H)


for i in range(14):
    img = render(i)
    _ = float(np.asarray(img[0, 0, 0]))
    print(f"warm {i}", flush=True)

# profile ONLY the dispatch half (no sync): this is the per-frame host
# work that the pipelined loop must hide
prof = cProfile.Profile()
imgs = []
t0 = time.perf_counter()
prof.enable()
for i in range(5):
    imgs.append(render(i))
prof.disable()
dispatch_ms = (time.perf_counter() - t0) / 5 * 1e3
for img in imgs:
    _ = float(np.asarray(img[0, 0, 0]))

print(f"\n== host dispatch: {dispatch_ms:.1f} ms/frame ==", flush=True)
s = io.StringIO()
pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(35)
print(s.getvalue())
