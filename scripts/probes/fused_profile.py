"""XLA device profile of the steady fused frame (if the backend supports
jax.profiler). Writes a trace to /tmp/voxelrs_trace for TensorBoard-style
inspection, and also prints a crude top-k of device ops if the trace's
.xplane protobuf is parseable.

Run on the TPU from /root/repo:  python -u scripts/probes/fused_profile.py
"""

import glob
import gzip
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VOXELRS_FUSED_REPLAY", "1")
os.environ["VOXELRS_FUSED_FRAME"] = "1"
os.environ.setdefault("VOXELRS_ASYNC_COMPILE", "0")
os.environ.setdefault("VOXELRS_BENCH_SCENE", "procedural")

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402

W, H = 1920, 1080
TRACE_DIR = "/tmp/voxelrs_trace"

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
    img = svo.render(p, W, H)
    return float(np.asarray(img[0, 0, 0]))


for i in range(12):
    t0 = time.perf_counter()
    render(i)
    print(f"warm {i}: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

try:
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(3):
        render(i)
    jax.profiler.stop_trace()
    print("trace written to", TRACE_DIR, flush=True)
except Exception as e:  # backend may not support profiling
    print("profiler unsupported:", repr(e), flush=True)
    sys.exit(0)

# crude xplane scan: pull op names + durations out of the pb (best effort)
paths = glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, flush=True)
try:
    from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
except Exception:
    _pywrap_profiler = None
for p in glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True):
    import json

    with gzip.open(p) as f:
        tr = json.load(f)
    evs = [e for e in tr.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("dur")]
    by_name: dict = {}
    for e in evs:
        by_name.setdefault(e["name"], [0, 0.0])
        by_name[e["name"]][0] += 1
        by_name[e["name"]][1] += e["dur"] / 1e3
    top = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:40]
    print(f"== {p}")
    for name, (cnt, ms) in top:
        print(f"  {ms:9.2f} ms  x{cnt:5d}  {name[:110]}")
