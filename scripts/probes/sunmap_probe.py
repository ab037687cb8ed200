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
orig = beams_mod.BeamContext.sun_verdicts


def patched(self, ro, max_dst):
    v = orig(self, ro, max_dst)
    if v is not None:
        lit = np.asarray(v[0])
        blk = np.asarray(v[1])
        stats.append((lit.size, int(lit.sum()), int(blk.sum())))
    return v


beams_mod.BeamContext.sun_verdicts = patched


def main():
    from voxelrs_tpu.world.heightfield import opaque_lut_from_mask

    svo = Svo(new_registry(), capacity_mb=64)
    world_svo, chunks, hf = benchmod.build_world(
        opaque_lut=opaque_lut_from_mask(svo.translucent_block_mask))
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
    blk = sum(s[2] for s in stats)
    for i, (n, k, b) in enumerate(stats):
        print(f"shade-batch {i}: {n} lanes, {k} lit ({100*k/max(n,1):.1f}%),"
              f" {b} blocked ({100*b/max(n,1):.1f}%)")
    print(f"TOTAL: {tot} shade lanes, {lit} lit ({100*lit/max(tot,1):.1f}%)"
          f" + {blk} blocked ({100*blk/max(tot,1):.1f}%) = "
          f"{100*(lit+blk)/max(tot,1):.1f}% certified")


if __name__ == "__main__":
    main()
