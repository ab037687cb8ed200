"""Raw push-loop cost at coarse resolution (960x540) on the bench scene.

Measures, on the real device buffer and the real coarse ray set:
  A) full-width loop to retirement (no compaction)
  B) loop N1 iters full width, one restart-compaction, N2 iters narrow
against the in-pipeline fused-replay coarse cost (~134 ms at 8 segments).
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
K = 4

world_svo, chunks = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)
print(f"world: {chunks} chunks depth {svo.depth}", flush=True)

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


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    print(f"{name}: {dt*1e3:7.1f} ms", flush=True)
    return out, dt


def full(buf, ro, rd, n_iters):
    fat = T._make_fat_rows(buf)
    c = T.make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
    st = T.init_state_push(c, stack_height=H_STK)
    iters, st = T.run_loop_push(fat, c, st, n_iters, K)
    return st.active.sum(), st.hit.sum(), st.t_min.sum()


if __name__ == "__main__":
    for n in (12, 16, 24, 48, 96):
        out, dt = timeit(f"full-width {n:3d} iters",
                         jax.jit(lambda b, o, d, n=n: full(b, o, d, n)),
                         buf, ro, rd)
        a, h, _ = out
        print(f"    active {int(a)} hit {int(h)}", flush=True)
