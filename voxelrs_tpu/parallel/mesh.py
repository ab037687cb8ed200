"""Multi-chip scaling: pixel-space sharding over a jax Mesh.

The reference is single-GPU; the natural TPU scale-out axis for an SVO
raytracer is the ray/pixel grid (SURVEY §2.6): shard image rows across
devices with the SVO buffer + materials replicated, and let XLA run the
traversal loop SPMD — rays are independent, so no collectives are needed
until the final image gather. World sharding (chunk ranges per chip with
rays migrating over ICI) is the follow-on axis for worlds larger than one
chip's HBM.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.shading import render_frame


def make_ray_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices; axis "rays" shards the pixel
    grid."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("rays",))


def render_frame_sharded(
    mesh: Mesh,
    descriptors,
    octree_scale,
    mips,
    mat_params,
    mat_tex,
    *,
    width: int,
    height: int,
    render_shadows: bool,
    cam_pos,
    cam_right,
    cam_up,
    cam_fwd,
    fov_y_rad,
    aspect,
    ambient,
    light_dir,
    shadow_distance,
    highlight_pos,
    max_steps: int = 1000,
):
    """Render one frame with image rows sharded over the mesh.

    The SVO buffer, materials, and textures are replicated; each device
    traces its row slab independently (ICI traffic: none in the loop, one
    all-gather materializes the image if the caller requests it unsharded).
    """
    assert height % mesh.devices.size == 0, (
        f"height {height} must divide over {mesh.devices.size} devices"
    )
    replicated = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P("rays", None, None))

    def fn(buf, scale, mips, mat_params, mat_tex, cam_pos, cam_right, cam_up,
           cam_fwd, fov, aspect_, ambient_, light, shadow_dst, highlight):
        return render_frame(
            buf, scale, mips, mat_params, mat_tex,
            width=width, height=height, render_shadows=render_shadows,
            cam_pos=cam_pos, cam_right=cam_right, cam_up=cam_up,
            cam_fwd=cam_fwd, fov_y_rad=fov, aspect=aspect_, ambient=ambient_,
            light_dir=light, shadow_distance=shadow_dst,
            highlight_pos=highlight, max_steps=max_steps,
        )

    jitted = jax.jit(fn, out_shardings=row_sharded)
    args = [descriptors, octree_scale, mips, mat_params, mat_tex, cam_pos,
            cam_right, cam_up, cam_fwd, fov_y_rad, aspect, ambient, light_dir,
            shadow_distance, highlight_pos]
    args = [
        jax.device_put(a, replicated) if not isinstance(a, tuple)
        else tuple(jax.device_put(x, replicated) for x in a)
        for a in args
    ]
    return jitted(*args)
