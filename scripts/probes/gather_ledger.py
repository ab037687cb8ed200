"""Row-gather work ledger for one bench-scene frame (CPU).

Renders the bench fly-through scene a few times so the wavefront plans
converge, then walks every pipeline's _PlanStore and prices each stage in
ROW GATHERS — the unit the TPU frame cost is measured in (docs/PERF.md:
~4.1 ms per million fast-tier row fetches). Gather counts are platform
-independent, so a CPU run prices the TPU frame exactly.

  traversal: width x seg per segment — one fat-row gather per LOOP
             ITERATION per lane, needed or not (run_loop_push: each
             while-iteration = 1 fetch phase + VOXELRS_SUBSTEPS fetch-free
             substeps; plan seg lengths count iterations)
  compact:   bucket-many packed-state row gathers per compaction
"""

import math
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
from voxelrs_tpu.ops import shading

W = int(os.environ.get("LEDGER_W", "960"))
H = int(os.environ.get("LEDGER_H", "540"))
FRAMES = int(os.environ.get("LEDGER_FRAMES", "3"))
SUBSTEPS = int(os.environ.get("VOXELRS_SUBSTEPS", "4"))
MS_PER_M = 4.1e-3  # fast-tier ms per 1e3 row gathers (docs/PERF.md)


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
    for i in range(FRAMES):
        p = RenderParams(**{**params.__dict__})
        p.cam_pos = params.cam_pos + np.array([2.0 * i, 0, 1.5 * i],
                                              np.float32)
        np.asarray(svo.render(p, W, H))
        print(f"# frame {i} done", file=sys.stderr, flush=True)

    total_trav = 0
    total_comp = 0
    rows = []
    for key, pipe in shading._pipeline_cache.items():
        for item in pipe:
            if isinstance(item, shading._PlanStore):
                # sticky scalars (current bucket sizes) let us drop STALE
                # plan variants: a tag like (('refine', 65536), 'fl') is
                # only live when the sticky 'refine_k' still equals 65536 —
                # older buckets' plans linger in the store and would
                # double-count the stage
                sticky = {k: v for k, v in item.plans.items()
                          if isinstance(v, int)}

                def _tag_live(tag):
                    stack = [tag]
                    while stack:
                        t = stack.pop()
                        if (isinstance(t, tuple) and len(t) == 2
                                and isinstance(t[0], str)
                                and isinstance(t[1], int)):
                            name = (t[0] if t[0].endswith("_k")
                                    else t[0] + "_k")
                            if name in sticky and sticky[name] != t[1]:
                                return False
                        if isinstance(t, tuple):
                            stack.extend(t)
                    return True

                for tag, entry in sorted(item.plans.items(),
                                         key=lambda kv: str(kv[0])):
                    if not (isinstance(entry, tuple) and len(entry) == 2
                            and isinstance(entry[1], (list, tuple))):
                        continue  # sticky-scalar entries are plain ints
                    if not _tag_live(tag):
                        continue
                    n, plan = entry
                    width = n
                    trav = comp = 0
                    segs = []
                    for seg, bucket in plan:
                        phases = seg  # 1 gather per loop iteration
                        trav += width * phases
                        segs.append(f"{seg}@{width}")
                        if bucket:
                            comp += bucket
                            width = bucket
                    rows.append((str(tag), n, trav, comp,
                                 " ".join(segs)))
                    total_trav += trav
                    total_comp += comp
    rows.sort(key=lambda r: -r[2])
    print(f"{'tag':38s} {'n0':>8s} {'trav_gathers':>13s} {'compact':>9s}")
    for tag, n, trav, comp, segs in rows:
        print(f"{tag:38s} {n:8d} {trav:13d} {comp:9d}   {segs}")
    b = W * H
    print(f"\nTOTAL traversal row-gathers/frame: {total_trav:,} "
          f"(~{total_trav*MS_PER_M/1e3:.1f} ms fast-tier)")
    print(f"TOTAL compaction row-gathers/frame: {total_comp:,} "
          f"(~{total_comp*MS_PER_M/1e3:.1f} ms)")
    print(f"frame = {b:,} pixels; traversal gathers/pixel = "
          f"{total_trav/b:.2f}")

    # shade/finalize pricing from the sticky buckets: shade = ONE fast-tier
    # row gather per hit lane (the paired color+normal footprint atlas;
    # the material row, face basis and mip metadata are one-hot reductions
    # — ops/smalltab.py). In the adaptive pipeline finalize is FETCH-FREE
    # (values carried: merge fills + the compact refine_values fetch); the
    # adaptive merge's corner value fetch runs at the coarse width.
    ks = []
    coarse_n0 = 0
    for key, pipe in shading._pipeline_cache.items():
        for item in pipe:
            if isinstance(item, shading._PlanStore):
                for name in ("hits_k", "refine_k", "crefine_k"):
                    v = item.plans.get(name)
                    if isinstance(v, int):
                        ks.append((name, v))
                for tag, entry in item.plans.items():
                    if (isinstance(entry, tuple) and len(entry) == 2
                            and "coarse" in str(tag)):
                        coarse_n0 = max(coarse_n0, entry[0])
    k_hits = max((v for n, v in ks if n == "hits_k"), default=0)
    k_ref = max((v for n, v in ks if n == "refine_k"), default=0)
    if k_hits:
        k_eff = b if k_hits >= b // 3 else k_hits  # dense frames shade at B
        shade_ms = k_eff * MS_PER_M / 1e3
        merge_ms = coarse_n0 * MS_PER_M / 1e3
        rval_ms = k_ref * MS_PER_M / 1e3
        print(f"hit bucket k = {k_hits:,} (shade width {k_eff:,}): "
              f"shade ~{shade_ms:.1f} ms (1 fast gather/lane)")
        print(f"merge corner fetch {coarse_n0:,} (~{merge_ms:.1f} ms), "
              f"refine-values {k_ref:,} (~{rval_ms:.1f} ms), finalize 0")
        tot = ((total_trav + total_comp) * MS_PER_M / 1e3 + shade_ms
               + merge_ms + rval_ms)
        print(f"MODELED device gather total: ~{tot:.1f} ms/frame")


if __name__ == "__main__":
    main()
