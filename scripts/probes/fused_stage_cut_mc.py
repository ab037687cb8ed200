"""Cumulative per-stage device cost inside the fused JUDGED frame on the
MC benchmark scene (the driver-metric scene).

Same mechanism as fused_stage_cut.py (VOXELRS_STAGE_CUT truncation of the
one fused program, steady frame time = cumulative device cost), pointed at
the judged/translucent pipeline the MC world runs. Run on the TPU:
    python -u scripts/probes/fused_stage_cut_mc.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VOXELRS_FUSED_REPLAY", "1")
os.environ["VOXELRS_FUSED_FRAME"] = "1"
os.environ.setdefault("VOXELRS_ASYNC_COMPILE", "0")

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

from bench import _scene_mc  # noqa: E402

CUTS = [
    "args",
    "raygen",
    "coarse",
    "adaptive-merge",
    "refine",
    "compact-hits",
    "shade",
    "shadow-bucket jns1_k",
    "sun-verdicts jns1_k",
    "shadow-trace jns1_k",
    "shadow-bucket jns2_k",
    "shadow-trace jns2_k",
    "shadow",
    None,  # full frame
]

render, _batch, poses, _label = _scene_mc()


def frame(i):
    img = render(poses[i % 5])
    return float(np.asarray(img[0, 0, 0]))


# settle every plan with FULL frames first (cut programs replay them)
for i in range(int(os.environ.get("WARMUP", "14"))):
    t0 = time.perf_counter()
    frame(i)
    print(f"warm {i}: {(time.perf_counter() - t0) * 1e3:.0f} ms", flush=True)

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
            frame(i)
            dt = time.perf_counter() - t0
            if rep > 0:  # rep 0 pays the compile
                times.append(dt)
    med = float(np.median(times)) * 1e3
    results[name] = round(med, 1)
    print(f"cut {name}: {med:.0f} ms (delta {med - prev:+.0f})", flush=True)
    prev = med

os.environ.pop("VOXELRS_STAGE_CUT", None)
print(json.dumps(results))
