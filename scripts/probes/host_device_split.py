"""Split the steady frame into HOST (python+enqueue) vs DEVICE time.

In the pipelined steady state wall = max(host, device) + bubbles; this
measures the host-side cost of svo.render() (enqueue-only; the returned
array is synced later) against the wall clock.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np

from bench import build_world
from voxelrs_tpu.gamelogic.content import new_registry
from voxelrs_tpu.graphics.svo import RenderParams, Svo

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
        cam_pos=base + np.array([2.0 * (i % 5), 0.0, 1.5 * (i % 5)], np.float32),
        cam_fwd=fwd, aspect_ratio=W / H, fov_y_rad=np.radians(80.0),
        render_shadows=True, shadow_distance=300.0,
    )
    return svo.render(p, W, H)


# warmup
for i in range(12):
    img = render(i)
    _ = float(np.asarray(img[0, 0, 0]))

# measure: host time of render() call vs wall per frame, 2-deep pipeline
from collections import deque

inflight = deque()
host_ts, wall_ts = [], []
t_prev = time.perf_counter()
for i in range(10):
    t0 = time.perf_counter()
    img = render(i)
    host_ts.append(time.perf_counter() - t0)
    inflight.append(img)
    if len(inflight) > 1:
        _ = float(np.asarray(inflight.popleft()[0, 0, 0]))
    wall_ts.append(time.perf_counter() - t_prev)
    t_prev = time.perf_counter()
while inflight:
    _ = float(np.asarray(inflight.popleft()[0, 0, 0]))

print(f"host (render() enqueue): med {np.median(host_ts)*1e3:.0f} ms")
print(f"wall per frame pipelined: med {np.median(wall_ts)*1e3:.0f} ms")

# pure device time: enqueue one frame after full sync, then sync
_ = float(np.asarray(render(0)[0, 0, 0]))
ts = []
for i in range(4):
    t0 = time.perf_counter()
    img = render(i)
    t1 = time.perf_counter()
    _ = float(np.asarray(img[0, 0, 0]))
    t2 = time.perf_counter()
    ts.append((t1 - t0, t2 - t1))
enq = np.median([a for a, _ in ts])
dev = np.median([b for _, b in ts])
print(f"sequential: enqueue {enq*1e3:.0f} ms + sync-wait {dev*1e3:.0f} ms")
