"""A/B the classic vs push-driven traversal engines on the bench scene.

Times raw loop segments (no compaction, no shading) at 1080p on the real
buffer, isolating per-iteration cost and progress of each engine.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("devices:", jax.devices(), flush=True)

from bench import build_world  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402
from voxelrs_tpu.ops.shading import generate_rays  # noqa: E402
from voxelrs_tpu.ops import traversal as T  # noqa: E402

W, H = 1920, 1080

world_svo, chunks = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)
print(f"world: {chunks} chunks depth {svo.depth} {svo.stats.used_bytes/1e6:.1f}MB "
      f"device_buf {svo.device_buf.shape[0]*4/1e6:.1f}MB", flush=True)

fwd = np.array([0.55, -0.35, 0.76], np.float32)
fwd /= np.linalg.norm(fwd)
p = RenderParams(cam_pos=np.array([16.0, 95.0, -20.0], np.float32), cam_fwd=fwd,
                 aspect_ratio=W / H, fov_y_rad=np.radians(80.0))
from voxelrs_tpu.graphics.camera import Camera  # noqa: E402

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


# classic engine: N steps
def classic(buf, ro, rd, n_steps):
    rows = T._make_rows(buf)
    c = T.make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
    st = T.init_state(c)
    steps, st = T.run_loop(rows, c, st, n_steps, 4, False, None)
    return st.active.sum(), st.hit.sum(), steps


# push engine: N iterations x K substeps
def push(buf, ro, rd, n_iters, k):
    fat = T._make_fat_rows(buf)
    c = T.make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
    st = T.init_state_push(c)
    iters, st = T.run_loop_push(fat, c, st, n_iters, k)
    return st.active.sum(), st.hit.sum(), iters


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "classic"):
        for n in (32, 64, 128):
            out, dt = timeit(f"classic {n:4d} steps",
                             jax.jit(lambda b, o, d, n=n: classic(b, o, d, n)),
                             buf, ro, rd)
            a, h, _ = out
            print(f"    active {int(a)} hit {int(h)}", flush=True)
    if which in ("both", "push"):
        for k in (2, 3, 4):
            for n in (16, 32, 64):
                out, dt = timeit(
                    f"push k={k} {n:4d} iters",
                    jax.jit(lambda b, o, d, n=n, k=k: push(b, o, d, n, k)),
                    buf, ro, rd)
                a, h, _ = out
                print(f"    active {int(a)} hit {int(h)}", flush=True)
