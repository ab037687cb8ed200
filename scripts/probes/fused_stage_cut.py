"""Cumulative per-stage device cost INSIDE the fused whole-frame program.

The fused frame is ONE XLA program, so VOXELRS_TIMING's inter-program
syncs can't see inside it (and the multi-program fallback distorts small
stages with per-program launch overhead). This probe instead renders the
bench poses with VOXELRS_STAGE_CUT=<stage>: the fused program is truncated
right after that stage (its output anchored by a sum so nothing is DCE'd)
and the steady frame time IS the cumulative device cost up to the stage.
Adjacent differences attribute the frame.

Each cut is a distinct compiled program: first flight pays a remote
compile (cached in .jax_cache afterwards). Run on the TPU from /root/repo:
    python -u scripts/probes/fused_stage_cut.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VOXELRS_FUSED_REPLAY", "1")
os.environ["VOXELRS_FUSED_FRAME"] = "1"

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402

W, H = 1920, 1080

CUTS = [
    "args",
    "raygen",
    "coarse4",
    "coarse-refine",
    "adaptive-merge",
    "refine",
    "refine-values",
    "finalize",
    "shade",
    "shadow-trace ns1",
    "shadow-trace ns2",
    "shadow",
    None,  # full frame
]

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


# settle every plan with FULL frames first (cut programs replay them)
for i in range(int(os.environ.get("WARMUP", "14"))):
    t0 = time.perf_counter()
    img = render(i)
    _ = float(np.asarray(img[0, 0, 0]))
    print(f"warm {i}: {(time.perf_counter() - t0) * 1e3:.0f} ms",
          flush=True)

results = {}
prev = 0.0
for cut in CUTS:
    name = cut or "FULL"
    if cut is None:
        os.environ.pop("VOXELRS_STAGE_CUT", None)
    else:
        os.environ["VOXELRS_STAGE_CUT"] = cut
    times = []
    for rep in range(3):
        for i in range(5):
            t0 = time.perf_counter()
            img = render(i)
            _ = float(np.asarray(img[0, 0, 0]))
            dt = time.perf_counter() - t0
            if rep > 0:  # rep 0 pays the compile
                times.append(dt)
    med = float(np.median(times)) * 1e3
    results[name] = round(med, 1)
    print(f"cut {name}: {med:.0f} ms (delta {med - prev:+.0f})", flush=True)
    prev = med

os.environ.pop("VOXELRS_STAGE_CUT", None)
print(json.dumps(results))
