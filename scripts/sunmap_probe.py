"""Measure sun-map shadow elision on the bench scene (CPU).

Renders one bench frame at reduced resolution and reports, per shadow
bucket, what fraction of shadow rays the sun map proves lit — the
ceiling on what pre-bucket elision can save.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as benchmod
from voxelrs_tpu.gamelogic.content import new_registry
from voxelrs_tpu.graphics.svo import RenderParams, Svo
from voxelrs_tpu.ops import beams as beams_mod

W, H = 480, 270

stats = []
orig = beams_mod.BeamContext.sun_lit


def patched(self, ro):
    lit = orig(self, ro)
    if lit is not None:
        m = np.asarray(lit)
        stats.append((m.size, int(m.sum())))
    return lit


beams_mod.BeamContext.sun_lit = patched


def main():
    world_svo, chunks, hf = benchmod.build_world()
    svo = Svo(new_registry(), capacity_mb=64)
    svo.update(world_svo)
    svo.set_heightfield(hf)
    fwd = np.array([0.55, -0.35, 0.76], np.float32)
    fwd /= np.linalg.norm(fwd)
    params = RenderParams(
        cam_pos=np.array([16.0, 95.0, -20.0], np.float32),
        cam_fwd=fwd,
        aspect_ratio=W / H,
        fov_y_rad=np.radians(80.0),
        render_shadows=True,
        shadow_distance=300.0,
    )
    img = svo.render(params, W, H)
    np.asarray(img)
    print(f"# world: {chunks} chunks; sun_map avail: "
          f"{hf.sun_map(params.light_dir) is not None}")
    tot = sum(s[0] for s in stats)
    lit = sum(s[1] for s in stats)
    for i, (n, k) in enumerate(stats):
        print(f"shade-batch {i}: {n} lanes, {k} lit ({100*k/max(n,1):.1f}%)")
    print(f"TOTAL: {tot} shade lanes, {lit} provably lit "
          f"({100*lit/max(tot,1):.1f}%)")


if __name__ == "__main__":
    main()
