"""Debug the fetch-on-PUSH CSVO engine against _Readers ground truth.

Builds the test_csvo_render_matches_esvo scene, finds a disagreeing pixel
between the ESVO and CSVO deferred renders, then steps the push engine in
Python (fetch + substep unrolled) asserting at every substep that the
register values (hdr, window reads) match fresh _Readers reads.
"""
import os
import jax as _jax
_jax.config.update("jax_platforms", "cpu")
_jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax
import jax.numpy as jnp

from voxelrs_tpu.world.chunk import ChunkPos
from voxelrs_tpu.world.csvo import Csvo, CsvoSerializedChunk
from voxelrs_tpu.world.esvo import Esvo, SerializedChunk
from voxelrs_tpu.world.octree import Position
from voxelrs_tpu.gamelogic.content import new_registry
from voxelrs_tpu.graphics.svo import RenderParams, Svo

vox = np.zeros((32, 32, 32), np.uint32)
vox[:, :8, :] = 3
vox[:, 8, :] = 1
vox[10:14, 9:12, 10:14] = 12

params = RenderParams(
    cam_pos=np.array([2.0, 20.0, -4.0], np.float32),
    cam_fwd=np.array([0.5, -0.5, 0.7], np.float32) / np.linalg.norm([0.5, -0.5, 0.7]),
    aspect_ratio=4 / 3,
    render_shadows=True,
    shadow_distance=100.0,
)

esvo_world = Esvo()
esvo_world.set_leaf(Position(0, 0, 0), SerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True)
esvo_world.serialize()
svo_e = Svo(new_registry(), capacity_mb=4)
svo_e.update(esvo_world)
img_e = np.asarray(svo_e.render(params, 96, 72, max_steps=300))

csvo_world = Csvo()
csvo_world.set_leaf(Position(0, 0, 0), CsvoSerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True)
csvo_world.serialize()
svo_c = Svo(new_registry(), capacity_mb=4, buffer_dtype=np.uint8)
svo_c.update(csvo_world)
img_c = np.asarray(svo_c.render(params, 96, 72, max_steps=300))

d = np.abs(img_e.astype(np.float64) - img_c.astype(np.float64)).max(axis=2)
print("mean diff", d.mean(), "bad pixels", (d > 0.02).sum(), "of", d.size)
ys, xs = np.nonzero(d > 0.02)
if len(ys) == 0:
    print("NO DISAGREEMENT — images match")
    raise SystemExit(0)
print("first bad pixels (y,x):", list(zip(ys[:10].tolist(), xs[:10].tolist())))
