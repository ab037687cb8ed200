"""Post-slim cost map of the fused-frame building blocks at real widths.

The round-4 plan ledger (plan_ledger.py) prices the trace loops at only
~17M lane-iterations/frame; the stage cut says coarse-refine + refine
cost ~130 ms — so the gap must live in the surrounding machinery. This
probe times each piece standalone on the chip:

  - run_loop_push segments at the plan widths (130K/49K/8K), substeps 4/6/8
  - compact_indices (nonzero ordering) at 2.07M and 518K
  - merge_refined-style scatter at 2.07M
  - packed-state compaction gather
  - a full-width (B,) elementwise op chain (the per-op floor)

Run on the TPU from /root/repo:  python -u scripts/probes/segment_cost_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_world  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402
from voxelrs_tpu.graphics.camera import Camera  # noqa: E402
from voxelrs_tpu.ops.shading import generate_rays, compact_indices  # noqa: E402
from voxelrs_tpu.ops import traversal as T  # noqa: E402

W, H = 1920, 1080
B = W * H

world_svo, chunks, hf = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)

p = RenderParams(cam_pos=np.array([16.0, 95.0, -20.0], np.float32),
                 cam_fwd=np.array([0.55, -0.35, 0.76], np.float32)
                 / np.linalg.norm([0.55, -0.35, 0.76]),
                 aspect_ratio=W / H, fov_y_rad=np.radians(80.0))
cam = Camera(np.degrees(p.fov_y_rad), p.aspect_ratio, 0.01, 1024)
cam.position, cam.forward = p.cam_pos, p.cam_fwd
s_, u_, f_ = cam.camera_basis()
ro, rd = jax.jit(lambda: generate_rays(W, H, jnp.asarray(cam.position),
                                       jnp.asarray(s_), jnp.asarray(u_),
                                       jnp.asarray(f_),
                                       jnp.float32(p.fov_y_rad),
                                       jnp.float32(p.aspect_ratio)))()
buf = svo.device_buf
scale = jnp.float32(svo.octree_scale)
H_STK = min(12, svo.depth + 1)


def sync(x):
    _ = float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(name, fn, *args, n=3, reps=10):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        ts.append((time.time() - t0) / reps)
    dt = float(np.median(ts))
    print(f"{name}: {dt*1e3:7.2f} ms", flush=True)
    return out, dt


@jax.jit
def mkstate(buf, ro, rd, n_iters):
    fat = T._make_fat_rows(buf)
    c = T.make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
    st = T.init_state_push(c, stack_height=H_STK)
    _, st = T.run_loop_push(fat, c, st, n_iters, 4, opaque=True)
    return c, st


c_full, state = mkstate(buf, ro, rd, 2)
sync(state.t_min)
print(f"state after 2 iters: active={int(np.asarray(state.active).sum())}",
      flush=True)

# --- trace segments at plan widths, substeps sweep -----------------------
for k in (130352, 49152, 8192):
    idx = jnp.nonzero(state.active, size=k, fill_value=0)[0]
    sub = jax.jit(T.gather_lane_state, static_argnums=())(state, idx)
    sub_ro, sub_rd = ro[idx], rd[idx]
    sync(sub.t_min)

    for substeps in (4, 6, 8):
        def seg(buf, ro_k, rd_k, sub, n=12, ss=substeps):
            fat = T._make_fat_rows(buf)
            c = T.make_ray_consts(scale, ro_k, rd_k, jnp.float32(-1.0))
            _, st = T.run_loop_push(fat, c, sub, n, ss, opaque=True)
            return st.t_min
        timeit(f"12-iter seg ss={substeps} @{k:7d}", jax.jit(seg),
               buf, sub_ro, sub_rd, sub)

# --- full-width machinery --------------------------------------------------
mask = state.hit
timeit("compact_indices @2.07M->131072",
       jax.jit(lambda m: compact_indices(m, 131072)), mask)
mask_c = mask[:518400]
timeit("compact_indices @518K->65536",
       jax.jit(lambda m: compact_indices(m, 65536)), mask_c)

vals = state.t_min
idx_r = jnp.nonzero(mask, size=131072, fill_value=0)[0]
sub_v = vals[idx_r]
timeit("scatter 131K->2.07M (merge_refined shape)",
       jax.jit(lambda v, i, sv: v.at[i].set(jnp.where(sv > 0, sv, v[i]))),
       vals, idx_r, sub_v)

timeit("row-gather 2.07M from packed state",
       jax.jit(lambda st, i: T.pack_lane_state(st)[i][:, 0]),
       state, idx_r)

# elementwise op-chain floor at full width
def chain(x):
    for _ in range(20):
        x = x * 1.000001 + 0.5
        x = jnp.minimum(x, 1e9)
    return x
timeit("20-op elementwise chain @2.07M", jax.jit(chain), vals)
timeit("20-op elementwise chain @131K", jax.jit(chain), sub_v)
