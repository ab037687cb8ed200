"""Isolate per-component cost of the push engine on the real bench buffer:
raw wide gather, gather+extract, fetch_phase, substep, full iteration."""

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
from voxelrs_tpu.graphics.camera import Camera  # noqa: E402
from voxelrs_tpu.ops.shading import generate_rays  # noqa: E402
from voxelrs_tpu.ops import traversal as T  # noqa: E402

W, H = 1920, 1080
ITERS = 16

world_svo, chunks = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)
print(f"buf {svo.device_buf.shape[0]*4/1e6:.1f}MB = {svo.device_buf.shape[0]//T.FAT_WIDTH} fat rows", flush=True)

p = RenderParams(cam_pos=np.array([16.0, 95.0, -20.0], np.float32),
                 cam_fwd=np.array([0.55, -0.35, 0.76], np.float32) / np.linalg.norm([0.55, -0.35, 0.76]),
                 aspect_ratio=W / H, fov_y_rad=np.radians(80.0))
cam = Camera(np.degrees(p.fov_y_rad), p.aspect_ratio, 0.01, 1024)
cam.position, cam.forward, cam.up = p.cam_pos, p.cam_fwd, p.cam_up
s_, u_, f_ = cam.camera_basis()
ro, rd = jax.jit(lambda: generate_rays(W, H, jnp.asarray(cam.position),
                                       jnp.asarray(s_), jnp.asarray(u_),
                                       jnp.asarray(f_), jnp.float32(p.fov_y_rad),
                                       jnp.float32(p.aspect_ratio)))()
buf = svo.device_buf
scale = jnp.float32(svo.octree_scale)
B = W * H


def sync(x):
    _ = float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(name, f, *args, n=3):
    out = f(*args)
    sync(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = f(*args)
        sync(out)
        ts.append(time.time() - t0)
    dt = float(np.median(ts)) / ITERS
    print(f"{name}: {dt*1e3:7.2f} ms/iter  ({dt/ (B/1e6)*1e3:6.2f} ms/M)", flush=True)


# random block addresses within the used buffer
n_blocks = svo.stats.used_bytes // 48
addr0 = jnp.asarray((np.random.randint(0, n_blocks, B) * 12).astype(np.uint32))


def mk_state():
    c = T.make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
    return c, T.init_state_push(c)


# 1) raw wide gather only (LCG-evolving row index)
def raw_gather(buf, addr):
    fat = T._make_fat_rows(buf)
    nr = fat.shape[0]

    def body(i, carry):
        a, acc = carry
        v = fat[(a % nr).astype(jnp.int32)]
        acc = acc ^ v[:, 0] ^ v[:, 107]
        a = a * jnp.uint32(1103515245) + jnp.uint32(12345)
        return a, acc

    return jax.lax.fori_loop(0, ITERS, body, (addr, jnp.zeros(B, jnp.uint32)))[1]


# 2) gather + 2 fused word extracts (the full fetch datapath)
def gather_extract(buf, addr):
    def body(i, carry):
        a, acc = carry
        fat = T._make_fat_rows(buf)
        pidx = (a >> jnp.uint32(28)).astype(jnp.int32) % 8
        d, w = T._fetch_words(fat, a & jnp.uint32(0x0FFFFFFF),
                              [pidx // 2, 4 + pidx])
        acc = acc ^ d ^ w
        a = a * jnp.uint32(1103515245) + jnp.uint32(12345)
        return a, acc

    return jax.lax.fori_loop(0, ITERS, body, (addr, jnp.zeros(B, jnp.uint32)))[1]


# 3) fetch_phase in a loop (real state)
def fetch_loop(buf, ro, rd):
    fat = T._make_fat_rows(buf)
    c, st = mk_state()

    def body(i, st):
        st = T.fetch_phase(fat, st)
        return st._replace(need_fetch=jnp.ones_like(st.need_fetch),
                           pp=st.pp ^ (i.astype(jnp.uint32) << 5))

    return jax.lax.fori_loop(0, ITERS, body, st).desc


# 4) substep only in a loop (real state, no fetches ever resolve)
def substep_loop(buf, ro, rd):
    c, st = mk_state()
    st = st._replace(need_fetch=jnp.zeros_like(st.need_fetch))

    def body(i, st):
        st = T.substep(c, st)
        return st._replace(need_fetch=jnp.zeros_like(st.need_fetch))

    return jax.lax.fori_loop(0, ITERS, body, st).t_min


# 5) full iteration (fetch + 3 substeps) — real loop, ITERS iterations
def full_loop(buf, ro, rd):
    fat = T._make_fat_rows(buf)
    c, st = mk_state()
    it, st = T.run_loop_push(fat, c, st, ITERS, 3)
    return st.t_min


if __name__ == "__main__":
    timeit("raw 108-gather       ", jax.jit(raw_gather), buf, addr0)
    timeit("gather+extract       ", jax.jit(gather_extract), buf, addr0)
    timeit("fetch_phase          ", jax.jit(fetch_loop), buf, ro, rd)
    timeit("substep              ", jax.jit(substep_loop), buf, ro, rd)
    timeit("iteration (f+3s)     ", jax.jit(full_loop), buf, ro, rd)
