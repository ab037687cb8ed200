"""Histogram fetch-phase pushes by target scale on the bench scene (CPU).

Answers: if pushes into the bottom K levels of the octree were fetch-free
(occupancy bits carried in registers), how many fetch phases would remain?
Runs the real push engine loop unjitted-per-iteration so per-iteration lane
counts can be read out.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/push_scale_probe.py [n_lanes]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_world
from voxelrs_tpu.gamelogic.content import new_registry
from voxelrs_tpu.graphics.svo import Svo
from voxelrs_tpu.ops import traversal as tr

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 15
SUBSTEPS = int(os.environ.get("VOXELRS_SUBSTEPS", "4"))

world_svo, chunks = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)
print(f"world: {chunks} chunks depth {svo.depth}", flush=True)

H = min(12, svo.depth + 1)


def make_rays(kind):
    rng = np.random.default_rng(0)
    if kind == "primary":
        ro = np.tile(np.array([16.0, 95.0, -20.0], np.float32), (N, 1))
        f = np.array([0.55, -0.35, 0.76], np.float32)
        f /= np.linalg.norm(f)
        r = np.cross(f, [0, 1, 0]); r /= np.linalg.norm(r)
        u = np.cross(r, f)
        px = (rng.random(N) * 2 - 1).astype(np.float32)
        py = (rng.random(N) * 2 - 1).astype(np.float32)
        rd = f[None] + 0.83 * px[:, None] * r[None] + 0.46 * py[:, None] * u[None]
    else:
        ro = np.stack([
            rng.random(N) * 200 + 20, np.full(N, 92.0), rng.random(N) * 200 + 20,
        ], 1).astype(np.float32)
        rd = np.tile(np.array([1.0, 1.0, 1.0], np.float32) / np.sqrt(3), (N, 1))
    rd = rd / np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd.astype(np.float32))


fat = tr._make_fat_rows(svo.device_buf)
scale_f = jnp.float32(svo.octree_scale)

step_j = jax.jit(tr.substep)
fetch_j = jax.jit(tr.fetch_phase)

for kind in ("primary", "shadow"):
    ro, rd = make_rays(kind)
    c = tr.make_ray_consts(scale_f, ro, rd, jnp.float32(-1.0))
    s = tr.init_state_push(c, stack_height=H)

    # scale histogram of fetch-serving lanes, per fetch phase
    hist = {}          # scale -> total fetch-lane count
    allleaf_by_scale = {}  # scale -> fetches into all-leaf-children nodes
    total_fetch_lanephases = 0
    iters = 0
    lane_iters_alive = 0
    for it in range(400):
        fetching = np.asarray(s.need_fetch & s.active)
        if fetching.any():
            sc = np.asarray(s.scale)[fetching]
            for v, n in zip(*np.unique(sc, return_counts=True)):
                hist[int(v)] = hist.get(int(v), 0) + int(n)
            total_fetch_lanephases += int(fetching.sum())
        s2 = fetch_j(fat, s)
        # classify the freshly fetched descriptors: all children leaves?
        if fetching.any():
            desc = np.asarray(s2.desc)[fetching]
            sc = np.asarray(s.scale)[fetching]
            al = ((desc >> 8) & ~desc & 0xFF) == 0
            for v in np.unique(sc):
                m = sc == v
                allleaf_by_scale[int(v)] = (
                    allleaf_by_scale.get(int(v), 0) + int(al[m].sum()))
        s = s2
        for _ in range(SUBSTEPS):
            s = step_j(c, s)
        alive = int(np.asarray(s.active).sum())
        lane_iters_alive += alive
        iters = it + 1
        if alive == 0:
            break

    smin = min(hist) if hist else 0
    smax = max(hist) if hist else 0
    print(f"\n{kind}: N={N} iters={iters} hits={int(np.asarray(s.hit).sum())} "
          f"fetch-lane-phases={total_fetch_lanephases} "
          f"({total_fetch_lanephases/N:.1f}/ray) "
          f"alive-lane-iters={lane_iters_alive} ({lane_iters_alive/N:.1f}/ray)")
    print("scale : fetches  (per-ray)  all-leaf-children%")
    for v in sorted(hist):
        al = allleaf_by_scale.get(v, 0)
        print(f"  {v:3d} : {hist[v]:8d}  ({hist[v]/N:7.2f})  "
              f"{100.0*al/max(hist[v],1):5.1f}%")
    # cumulative: fetches that remain if bottom-K scales are register-served
    cum = 0
    for k in range(1, min(6, smax - smin + 2)):
        cut = smin + k  # scales < cut are register-served
        saved = sum(n for v, n in hist.items() if v < cut)
        print(f"  bottom {k} level(s) fetch-free -> "
              f"{100.0*saved/max(total_fetch_lanephases,1):5.1f}% of fetch "
              f"lane-phases saved")
