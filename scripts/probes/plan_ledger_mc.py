"""Dump the recorded wavefront plans + sticky bucket widths after a
settled MC-scene fly-through (the judged/translucent pipeline — the
driver-metric scene).

Same idea as plan_ledger.py but pointed at the judged pipeline: for every
trace tag the compacted segment schedule and lane-iteration product, plus
the sticky scalars (refine_k, jqrefine_k, hits_k, shadow buckets) that
size the full-width machinery the round-4 stage cut attributes the MC
frame to.

Run on the TPU from /root/repo:  python -u scripts/probes/plan_ledger_mc.py
"""

import faulthandler
import os
import signal
import sys

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VOXELRS_FUSED_REPLAY", "1")
os.environ.setdefault("VOXELRS_ASYNC_COMPILE", "0")

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

from bench import _scene_mc  # noqa: E402
from voxelrs_tpu.ops import shading  # noqa: E402

render, _batch, poses, _label = _scene_mc()

for i in (0, 2, 4, 1, 3, 0, 1, 2, 3, 4, 0, 1, 2, 3, 4):
    img = render(poses[i])
    _ = float(np.asarray(img[0, 0, 0]))
print("# warmed", flush=True)

for key, pipe in shading._pipeline_cache.items():
    if not isinstance(key[0], int) or len(pipe) < 21:
        continue  # judged/deferred pipelines only
    store = pipe[9]
    if not getattr(store, "plans", None):
        continue
    print(f"\n== judged pipeline B={key[0]} {key[1]}x{key[2]} "
          f"shadows={key[3]} engine={key[7]} ==")
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
          f"(~{total_li * 7.5e-6:.1f} ms at 7.5 ns/lane/iter)")
