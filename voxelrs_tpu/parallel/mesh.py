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
import jax.numpy as jnp
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


def render_frame_deferred_sharded(
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
    stack_height: int = 12,
    engine: str = "esvo",
    beams=None,
):
    """The PRODUCTION deferred/adaptive pipeline, SPMD over the mesh.

    One XLA program renders a row slab of the global frame on every
    device: the slab body is ``ops.shading._opaque_frame_body`` — the same
    coarse/refine adaptive traces, fetch-free finalize, bucketed shadow
    passes and sun certificates the single-chip frame runs — driven by a
    ``_StaticPlanner`` (fixed full-budget trace segments, buckets at their
    caps) because SPMD execution admits no per-device host decision. The
    slab's rays are the global frame's rows [d*H/n, (d+1)*H/n): the body
    derives its first global row from ``lax.axis_index`` so ONE compiled
    program serves every device. The SVO buffer, materials and the beam
    envelope are replicated; per-pixel beam floors are row-sharded; ICI
    traffic is zero until the final image assembly.

    Restrictions vs the single-chip driver: opaque worlds only (the
    translucent judged pipeline keeps per-round host alpha judgement;
    translucent multi-chip rendering uses ``render_frame_sharded``), and
    no recorded-plan compaction (pad lanes instead of compiled-shape
    reuse — the single-host plan store is a latency optimization, not a
    correctness feature).
    """
    from jax import shard_map

    from ..ops import shading as _sh
    from ..ops.beams import BeamContext

    n = mesh.devices.size
    if height % n:
        raise ValueError(f"height {height} must divide over {n} devices")
    hs = height // n
    planner = _sh._StaticPlanner()

    have_beams = beams is not None
    if have_beams:
        t_floor_full = beams.t_floor
        beams_base = BeamContext(jnp.zeros(1, jnp.float32), beams._dev,
                                 width, height, sun=beams._sun)
    else:
        t_floor_full = jnp.zeros(width * height, jnp.float32)
        beams_base = None

    def body(descriptors, scale, mips, mat_params, mat_tex, cam_pos,
             cam_right, cam_up, cam_fwd, fov, aspect_, ambient_, light,
             shadow_dst, highlight, beams_base, t_floor_slab):
        row0 = jax.lax.axis_index("rays").astype(jnp.int32) * hs
        if beams_base is not None:
            beams_slab = BeamContext(t_floor_slab, beams_base._dev,
                                     width, hs, sun=beams_base._sun)
        else:
            beams_slab = None
        return _sh._opaque_frame_body(
            descriptors, scale, mips, mat_params, mat_tex, cam_pos,
            cam_right, cam_up, cam_fwd, fov, aspect_, ambient_, light,
            shadow_dst, highlight,
            width=width, height=hs, render_shadows=render_shadows,
            max_steps=max_steps, planner=planner, mark=lambda *_a: None,
            stack_height=stack_height, engine=engine, beams=beams_slab,
            row0=row0, full_height=height,
        )

    args = (descriptors, jnp.float32(octree_scale), mips, mat_params,
            mat_tex, cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect,
            ambient, light_dir, shadow_distance, highlight_pos, beams_base,
            t_floor_full)
    rep = jax.tree_util.tree_map(lambda _: P(), args[:16])
    in_specs = rep + (P("rays"),)
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=P("rays", None, None), check_vma=False)
    return jax.jit(fn)(*args)
