"""Dump the recorded wavefront plans after a settled bench fly-through.

For every trace tag: the compacted segment schedule (iterations x bucket
width), and the lane-iteration product — the elementwise/fetch cost unit
the round-4 stage cut says dominates the frame (coarse-refine + refine
re-traces ~= 136 ms of 221). Answers "where do the lane-iterations go"
with the plans the fused frame actually replays.

Run on the TPU from /root/repo:  python -u scripts/probes/plan_ledger.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VOXELRS_FUSED_REPLAY", "1")

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402
from voxelrs_tpu.ops import shading  # noqa: E402

W, H = 1920, 1080

svo = Svo(new_registry(), capacity_mb=64)
world_svo, chunks, hf = build_world()
svo.update(world_svo)
svo.set_heightfield(hf)

fwd = np.array([0.55, -0.35, 0.76], np.float32)
fwd /= np.linalg.norm(fwd)
base = np.array([16.0, 95.0, -20.0], np.float32)

for i in (0, 2, 4, 1, 3, 0, 1, 2, 3, 4, 0, 1, 2, 3, 4):
    p = RenderParams(
        cam_pos=base + np.array([2.0 * i, 0.0, 1.5 * i], np.float32),
        cam_fwd=fwd, aspect_ratio=W / H, fov_y_rad=np.radians(80.0),
        render_shadows=True, shadow_distance=300.0,
    )
    img = svo.render(p, W, H)
    _ = float(np.asarray(img[0, 0, 0]))
print("# warmed", flush=True)

for key, pipe in shading._pipeline_cache.items():
    store = pipe[6] if key[0] == "opq" else None
    if store is None or not store.plans:
        continue
    print(f"\n== pipeline {key[:4]} ==")
    total_li = 0
    for tag, val in sorted(store.plans.items(), key=repr):
        if isinstance(val, tuple) and len(val) == 2 and isinstance(val[1],
                                                                   list):
            n, plan = val
            width = n
            li = 0
            parts = []
            for seg, bucket in plan:
                li += seg * width
                parts.append(f"{seg}x{width}")
                if bucket is not None:
                    width = bucket
            total_li += li
            print(f"  {tag}: n={n} plan={parts} lane-iters={li/1e6:.2f}M")
        else:
            print(f"  {tag}: sticky={val}")
    print(f"  TOTAL lane-iters {total_li/1e6:.2f}M "
          f"(~{total_li * 7.5e-6:.1f} ms at 7.5 ns pre-slim)")
