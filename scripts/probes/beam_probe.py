"""Probe: how much does the beam pre-pass actually claim on the bench
scene? Prints primary-floor quantiles vs true hit t, certain-miss rates,
and shadow-gate statistics."""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("BP_PLAT", ""))

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.camera import Camera  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402

from voxelrs_tpu.ops.shading import generate_rays  # noqa: E402
from voxelrs_tpu.ops.traversal import intersect_octree  # noqa: E402

W, H = int(os.environ.get("BPW", "640")), int(os.environ.get("BPH", "360"))

world_svo, chunks, hf = build_world()
svo = Svo(new_registry(), capacity_mb=64)
svo.update(world_svo)
svo.set_heightfield(hf)
print(f"world: {chunks} chunks depth {svo.depth} "
      f"hmax {hf.device()[3]} n {hf.device()[2]}")

fwd = np.array([0.55, -0.35, 0.76], np.float32)
fwd /= np.linalg.norm(fwd)
params = RenderParams(
    cam_pos=np.array([16.0, 95.0, -20.0], np.float32), cam_fwd=fwd,
    aspect_ratio=W / H, fov_y_rad=np.radians(80.0),
    render_shadows=True, shadow_distance=300.0,
)
cam = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio, 0.01, 1024)
cam.position = np.asarray(params.cam_pos, np.float32)
cam.forward = np.asarray(params.cam_fwd, np.float32)
s, u, f = cam.camera_basis()
ctx = svo._beam_floors(cam, s, u, f, params, W, H)
floors = np.asarray(ctx.t_floor)

ro, rd = generate_rays(W, H, jnp.asarray(cam.position), jnp.asarray(s),
                       jnp.asarray(u), jnp.asarray(f),
                       jnp.float32(params.fov_y_rad),
                       jnp.float32(params.aspect_ratio))
res = intersect_octree(svo.device_buf, jnp.float32(svo.octree_scale), ro, rd,
                       jnp.float32(-1.0), False, max_steps=640)
t = np.asarray(res.t)
hit = t > 0
print(f"pixels {W*H}: hit {hit.mean():.2%}, floor=inf {np.isinf(floors).mean():.2%}")
fin = np.isfinite(floors)
print(f"floors (finite): q25={np.quantile(floors[fin],0.25):.1f} "
      f"med={np.median(floors[fin]):.1f} q75={np.quantile(floors[fin],0.75):.1f}")
print(f"hit t: med={np.median(t[hit]):.1f} q75={np.quantile(t[hit],0.75):.1f}")
cov = floors[hit] / np.maximum(t[hit], 1e-6)
print(f"floor/t coverage on hit pixels: med={np.median(cov):.2f} "
      f"q25={np.quantile(cov,0.25):.2f} q75={np.quantile(cov,0.75):.2f}")
miss = ~hit
print(f"miss pixels: {miss.mean():.2%} of frame; elided (inf floor): "
      f"{(np.isinf(floors)&miss).sum()/max(miss.sum(),1):.2%}")
print(f"  non-elided miss floors: med={np.median(floors[miss&fin]) if (miss&fin).any() else -1:.1f}")

# shadow elision (per-ray sun map)
from voxelrs_tpu.ops.shading import FACE_NORMALS  # noqa: E402

normal = FACE_NORMALS[jnp.clip(res.face_id, 0, 5)]
sro = (res.pos + normal * 0.001)[jnp.asarray(hit)]
light = np.asarray(params.light_dir, np.float32)
sfl = np.asarray(ctx.shadow_ray_floors(
    sro, jnp.full(sro.shape[0], -1.0, jnp.float32),
    jnp.asarray(-light)))
sres = intersect_octree(
    svo.device_buf, jnp.float32(svo.octree_scale), sro,
    jnp.broadcast_to(jnp.asarray(-light), sro.shape), jnp.float32(-1.0),
    False, max_steps=640)
blocked = np.asarray(sres.t) > 0
print(f"sun map: {'yes' if ctx._sun is not None else 'NO'}; shadow rays "
      f"{len(sfl)}: truly lit {(~blocked).mean():.1%}, elided "
      f"{np.isinf(sfl).mean():.1%} "
      f"({np.isinf(sfl).sum()/max((~blocked).sum(),1):.1%} of lit)")
