"""A/B the occupancy fetch-free push: iterations + wall time of raw
run_loop_push on bench-scene primary and shadow-style rays.

Usage: VOXELRS_OCC={0,1} python scripts/occ_probe.py [n_lanes]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_world
from voxelrs_tpu.gamelogic.content import new_registry
from voxelrs_tpu.graphics.svo import Svo
from voxelrs_tpu.ops import traversal as tr

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 19

world_svo, chunks = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)
print(f"world: {chunks} chunks depth {svo.depth} occ={tr._occ_on()}", flush=True)

H = min(12, svo.depth + 1)


def make_rays(kind):
    rng = np.random.default_rng(0)
    if kind == "primary":
        # camera rays from above the terrain looking down-forward
        ro = np.tile(np.array([16.0, 95.0, -20.0], np.float32), (N, 1))
        f = np.array([0.55, -0.35, 0.76], np.float32)
        f /= np.linalg.norm(f)
        r = np.cross(f, [0, 1, 0]); r /= np.linalg.norm(r)
        u = np.cross(r, f)
        px = (rng.random(N) * 2 - 1).astype(np.float32)
        py = (rng.random(N) * 2 - 1).astype(np.float32)
        rd = f[None] + 0.83 * px[:, None] * r[None] + 0.46 * py[:, None] * u[None]
    else:
        # shadow-style: grazing rays from surface points toward the sun
        ro = np.stack([
            rng.random(N) * 200 + 20, np.full(N, 92.0), rng.random(N) * 200 + 20,
        ], 1).astype(np.float32)
        rd = np.tile(np.array([1.0, 1.0, 1.0], np.float32) / np.sqrt(3), (N, 1))
    rd = rd / np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd.astype(np.float32))


@jax.jit
def run(buf, scale, ro, rd):
    fat = tr._make_fat_rows(buf)
    c = tr.make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
    s = tr.init_state_push(c, stack_height=H)
    it, s = tr.run_loop_push(fat, c, s, 400, 3)
    return it, s.hit.sum(), s.t_min.sum()


for kind in ("primary", "shadow"):
    ro, rd = make_rays(kind)
    it, hits, chk = run(svo.device_buf, jnp.float32(svo.octree_scale), ro, rd)
    _ = float(np.asarray(chk))  # force
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        it, hits, chk = run(svo.device_buf, jnp.float32(svo.octree_scale), ro, rd)
        _ = float(np.asarray(chk))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{kind}: iters={int(np.asarray(it))} hits={int(np.asarray(hits))} "
          f"chk={float(np.asarray(chk)):.1f} t={np.median(ts):.1f} ms "
          f"({1e-6 * N / (np.median(ts) / 1e3):.1f} Mrays/s raw)", flush=True)
