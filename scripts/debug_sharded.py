"""Smoke-test the SPMD production pipeline on a virtual 8-device mesh."""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax as _jax
_jax.config.update("jax_platforms", "cpu")
_jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax
import jax.numpy as jnp

from voxelrs_tpu.world.chunk import ChunkPos
from voxelrs_tpu.world.esvo import Esvo, SerializedChunk
from voxelrs_tpu.world.octree import Position
from voxelrs_tpu.gamelogic.content import new_registry
from voxelrs_tpu.graphics.svo import RenderParams, Svo
from voxelrs_tpu.graphics.camera import Camera
from voxelrs_tpu.parallel.mesh import make_ray_mesh, render_frame_deferred_sharded

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

world = Esvo()
world.set_leaf(Position(0, 0, 0), SerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True)
world.serialize()
svo = Svo(new_registry(), capacity_mb=4)
svo.update(world)

W, H = 96, 72
img_single = np.asarray(svo.render(params, W, H, max_steps=300))

cam = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio, 0.01, 1024)
cam.position = np.asarray(params.cam_pos, np.float32)
cam.forward = np.asarray(params.cam_fwd, np.float32)
cam.up = np.asarray(params.cam_up, np.float32)
s, u, f = cam.camera_basis()

mesh = make_ray_mesh()
img_sh = np.asarray(render_frame_deferred_sharded(
    mesh, svo.device_buf, svo.octree_scale, svo.mips, svo.mat_params,
    svo.mat_tex, width=W, height=H, render_shadows=True,
    cam_pos=jnp.asarray(cam.position), cam_right=jnp.asarray(s),
    cam_up=jnp.asarray(u), cam_fwd=jnp.asarray(f),
    fov_y_rad=jnp.float32(params.fov_y_rad),
    aspect=jnp.float32(params.aspect_ratio),
    ambient=jnp.float32(params.ambient_intensity),
    light_dir=jnp.asarray(params.light_dir, jnp.float32),
    shadow_distance=jnp.float32(params.shadow_distance),
    highlight_pos=jnp.full(3, np.nan, jnp.float32),
    max_steps=300,
))
print("sharded shape", img_sh.shape, "nan", np.isnan(img_sh).any())
d = np.abs(img_single.astype(np.float64) - img_sh.astype(np.float64))
print("mean |diff| vs single-device deferred:", d.mean(), "max", d.max())
bad = (d.max(axis=2) > 1e-5).sum()
print("pixels differing >1e-5:", bad, "of", d.shape[0] * d.shape[1])
