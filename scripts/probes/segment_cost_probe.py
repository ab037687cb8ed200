"""Cost model for the fused-trace segment machinery at realistic widths.

Times, on the bench scene: run_loop_push segments, scatter_frozen,
packed-state compaction gather, and nonzero ordering — the pieces a
coarse/refine/shadow fused trace is made of — to find where the gap
between the ~52 ms ideal coarse cost and the measured ~140 ms lives.
"""

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
from voxelrs_tpu.ops.shading import generate_rays  # noqa: E402
from voxelrs_tpu.ops import traversal as T  # noqa: E402

W, H = 960, 540
B = W * H

world_svo, chunks = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)

fwd = np.array([0.55, -0.35, 0.76], np.float32)
fwd /= np.linalg.norm(fwd)
p = RenderParams(cam_pos=np.array([16.0, 95.0, -20.0], np.float32), cam_fwd=fwd,
                 aspect_ratio=W / H, fov_y_rad=np.radians(80.0))
cam = Camera(np.degrees(p.fov_y_rad), p.aspect_ratio, 0.01, 1024)
cam.position, cam.forward, cam.up = p.cam_pos, p.cam_fwd, p.cam_up
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
    """Dispatch ``reps`` async calls, one sync: amortizes the ~26 ms tunnel
    readback so per-call device time is visible."""
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


def freeze(state):
    idxscale = (state.idx.astype(jnp.uint32)
                | (state.scale.astype(jnp.uint32) << 8))
    return (state.t_min, state.pp, idxscale,
            state.posx, state.posy, state.posz)


@jax.jit
def mkstate(buf, ro, rd, n_iters):
    fat = T._make_fat_rows(buf)
    c = T.make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
    st = T.init_state_push(c, stack_height=H_STK)
    _, st = T.run_loop_push(fat, c, st, n_iters, 4)
    return st


state = mkstate(buf, ro, rd, 12)
sync(state.t_min)
print(f"state after 12 iters: active={int(np.asarray(state.active).sum())}",
      flush=True)

for k in (1 << 17, 1 << 16, 1 << 15):
    idx = jnp.nonzero(state.active, size=k, fill_value=0)[0]  # real actives

    # 1) loop segment of 12 iters at width k (gather a sub-state first)
    sub = jax.jit(T.gather_lane_state)(state, idx)
    sync(sub.t_min)

    def seg(buf, sub):
        fat = T._make_fat_rows(buf)
        c = T.make_ray_consts(scale,
                              jnp.stack([sub.posx, sub.posy, sub.posz], 1),
                              jnp.stack([sub.posx, sub.posy, sub.posz], 1),
                              jnp.float32(-1.0))
        _, st = T.run_loop_push(fat, c, sub, 12, 4)
        return st.t_min

    timeit(f"12-iter segment  @{k:7d}", jax.jit(seg), buf, sub)

    # 2) packed-state compaction gather (from full B to k)
    timeit(f"packed compact   @{k:7d}",
           jax.jit(lambda s, i: T.gather_lane_state(s, i).t_min),
           state, idx)

    # 3) scatter_frozen: 6 channel at[idx].set + hit scatter (width k -> B)
    frozen = tuple(jnp.zeros(B, a.dtype) for a in freeze(state))
    hit_full = jnp.zeros(B, bool)
    sub_state = jax.jit(T.gather_lane_state)(state, idx)
    sync(sub_state.t_min)

    def scat(frozen, hit_full, idx, st):
        take = st.hit
        out = tuple(
            f.at[idx].set(jnp.where(take, cur, f[idx]))
            for f, cur in zip(frozen, freeze(st))
        )
        return out, hit_full.at[idx].set(hit_full[idx] | take)

    timeit(f"scatter_frozen   @{k:7d}", jax.jit(scat),
           frozen, hit_full, idx, sub_state)

    # 4) nonzero ordering over full B
    timeit(f"nonzero(size=k)  @{k:7d}",
           jax.jit(lambda s, kk=k: jnp.nonzero(s.active, size=kk,
                                               fill_value=0)[0]),
           state)
