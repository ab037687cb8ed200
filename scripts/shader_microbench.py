"""Shader micro-bench scenarios, per SVO format (reference:
src/graphics/svo_shader_tests.rs:1226-1326 — hitting_nothing /
hitting_opaque_voxel / hitting_transparent_voxels).

The reference benches one ray per iteration on the GPU; the TPU-native
equivalent casts a BATCH of the same scenario ray (the kernel is a
lock-step wavefront) and reports ns/ray. Writes docs/shader_microbench.json.

Run: python scripts/shader_microbench.py [n_lanes]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from voxelrs_tpu.gamelogic import content
from voxelrs_tpu.ops.shading import make_alpha_fn
from voxelrs_tpu.ops.traversal import _make_fat_rows, intersect_octree
from voxelrs_tpu.ops.traversal_csvo import intersect_octree_csvo
from voxelrs_tpu.world import ChunkPos, Position
from voxelrs_tpu.world.csvo import Csvo, CsvoSerializedChunk
from voxelrs_tpu.world.esvo import Esvo, SerializedChunk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18


def scenario_chunks():
    nothing = np.zeros((32, 32, 32), np.uint32)
    nothing[:, 0, 0] = content.STONE
    nothing[0, :, 0] = content.STONE
    nothing[0, 0, :] = content.STONE

    opaque = np.zeros((32, 32, 32), np.uint32)
    opaque[31, 0, 0] = content.STONE

    transparent = np.zeros((32, 32, 32), np.uint32)
    transparent[0:6, 0, 0] = content.GLASS
    transparent[6, 0, 0] = content.STONE
    return {
        "hitting_nothing": (nothing, (0.0, 1.5, 1.5), False),
        "hitting_opaque_voxel": (opaque, (0.0, 0.5, 0.5), False),
        "hitting_transparent_voxels": (transparent, (-0.1, 0.25, 0.75), True),
    }


def build_esvo(vox):
    world = Esvo()
    world.set_leaf(Position(0, 0, 0),
                   SerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True)
    world.serialize()
    buf = np.zeros(world.size_in_u32() + 12, np.uint32)
    world.write_to(buf)
    return jnp.asarray(buf), np.float32(2.0 ** -world.depth())


def build_csvo_world(vox):
    world = Csvo()
    world.set_leaf(Position(0, 0, 0),
                   CsvoSerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True)
    world.serialize()
    buf = np.zeros(((world.size_in_bytes() + 4 + 15) // 16 + 2) * 16, np.uint8)
    world.write_to(buf)
    root_ptr = int.from_bytes(bytes(buf[:4]), "little")
    return (jnp.asarray(buf[4:].view(np.uint32)), root_ptr,
            np.float32(2.0 ** -world.depth()), world.depth())


def bench(fn, *args):
    out = fn(*args)
    _ = float(np.asarray(out))
    ts = []
    for _i in range(7):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    mips, mat_params, mat_tex = content.new_registry().build()
    alpha_fn = make_alpha_fn(mips, mat_tex)
    results = {}
    for name, (vox, ro0, translucent) in scenario_chunks().items():
        ro = jnp.asarray(np.tile(np.array(ro0, np.float32), (N, 1)))
        rd = jnp.asarray(np.tile(np.array([1.0, 0.0, 0.0], np.float32), (N, 1)))
        md = jnp.float32(32.0)

        buf, scale = build_esvo(vox)
        fat = buf  # intersect_octree takes the flat buffer

        @jax.jit
        def esvo_run(buf, ro, rd):
            res = intersect_octree(buf, scale, ro, rd, md, translucent,
                                   alpha_fn=alpha_fn if translucent else None)
            return res.t.sum()

        dt = bench(esvo_run, buf, ro, rd)
        results.setdefault("esvo", {})[name] = {
            "ns_per_ray": dt / N * 1e9, "mrays_per_s": N / dt / 1e6,
        }
        print(f"esvo/{name}: {dt/N*1e9:.1f} ns/ray ({N/dt/1e6:.1f} Mrays/s)",
              flush=True)

        words, root_ptr, scale_c, depth = build_csvo_world(vox)

        @jax.jit
        def csvo_run(words, ro, rd):
            res = intersect_octree_csvo(
                words, scale_c, jnp.uint32(root_ptr), depth, ro, rd, md,
                translucent, alpha_fn=alpha_fn if translucent else None)
            return res.t.sum()

        dt = bench(csvo_run, words, ro, rd)
        results.setdefault("csvo", {})[name] = {
            "ns_per_ray": dt / N * 1e9, "mrays_per_s": N / dt / 1e6,
        }
        print(f"csvo/{name}: {dt/N*1e9:.1f} ns/ray ({N/dt/1e6:.1f} Mrays/s)",
              flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "shader_microbench.json")
    with open(out, "w") as f:
        json.dump({"n_lanes": N, "results": results}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
