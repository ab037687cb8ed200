"""The flagship pipeline: one fused frame step — camera rays, SVO traversal,
shading, shadow rays, and the physics picker batch — as a single traced XLA
computation over device-resident world state.

This is the engine's equivalent of a "forward pass": inputs are the HBM SVO
buffer + camera/entity state, output is the frame image + picker distances.
The north-star goal (BASELINE.json) is the whole per-frame work in one XLA
program with no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..gamelogic.content import new_registry
from ..ops.shading import FACE_NORMALS, render_frame
from ..ops.traversal import intersect_octree
from ..world import ChunkPos, Position
from ..world.esvo import Esvo, SerializedChunk


class FrameOutput(NamedTuple):
    image: jnp.ndarray  # (H, W, 4)
    picker_dst: jnp.ndarray  # (P,) distances for physics rays, -1 = miss
    picker_normal: jnp.ndarray  # (P, 3)


class FramePipeline:
    """Builds a jittable frame function over static (width, height, shadows)."""

    def __init__(self, mips, mat_params, mat_tex, *, width: int, height: int,
                 render_shadows: bool = True, max_steps: int = 1000,
                 picker_rays: int = 32):
        self.mips = mips
        self.mat_params = mat_params
        self.mat_tex = mat_tex
        self.width = width
        self.height = height
        self.render_shadows = render_shadows
        self.max_steps = max_steps
        self.picker_rays = picker_rays

    def frame_fn(self):
        width, height = self.width, self.height
        render_shadows, max_steps = self.render_shadows, self.max_steps
        mips, mat_params, mat_tex = self.mips, self.mat_params, self.mat_tex

        def fn(svo_buf, octree_scale, cam_pos, cam_right, cam_up, cam_fwd,
               fov_y_rad, aspect, ambient, light_dir, shadow_distance,
               highlight_pos, picker_tasks):
            image = render_frame(
                svo_buf, octree_scale, mips, mat_params, mat_tex,
                width=width, height=height, render_shadows=render_shadows,
                cam_pos=cam_pos, cam_right=cam_right, cam_up=cam_up,
                cam_fwd=cam_fwd, fov_y_rad=fov_y_rad, aspect=aspect,
                ambient=ambient, light_dir=light_dir,
                shadow_distance=shadow_distance, highlight_pos=highlight_pos,
                max_steps=max_steps,
            )
            # physics picker batch fused into the same program
            res = intersect_octree(
                svo_buf, octree_scale, picker_tasks[:, 1:4],
                picker_tasks[:, 4:7], picker_tasks[:, 0], False,
                max_steps=max_steps,
            )
            hit = res.t > 0
            dst = jnp.where(hit, res.t, -1.0)
            normal = jnp.where(
                hit[:, None], FACE_NORMALS[jnp.clip(res.face_id, 0, 5)], 0.0
            )
            return FrameOutput(image, dst, normal)

        return fn


def build_demo_scene(num_chunks: int = 2, width: int = 256, height: int = 192,
                     render_shadows: bool = True, max_steps: int = 300,
                     capacity_u32: int = 1 << 20):
    """A small self-contained scene + FramePipeline with example args —
    the compile-check entry point."""
    world_svo = Esvo()
    for cx in range(num_chunks):
        for cz in range(num_chunks):
            x, z = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
            gx, gz = x + 32 * cx, z + 32 * cz
            h = (9 + 5 * np.sin(gx / 7.0) + 4 * np.cos(gz / 9.0)).astype(int)
            vox = np.zeros((32, 32, 32), np.uint32)
            for y in range(32):
                vox[:, y, :] = np.where(
                    y <= h, np.where(y == h, 1, np.where(y >= h - 3, 2, 3)), 0
                )
            sc = SerializedChunk.from_voxels(ChunkPos(cx, 0, cz), vox, 5)
            world_svo.set_leaf(Position(cx, 0, cz), sc, True)
    world_svo.serialize()

    buf = np.zeros(capacity_u32, np.uint32)
    world_svo.write_to(buf)
    octree_scale = np.float32(2.0 ** -world_svo.depth())

    mips, mat_params, mat_tex = new_registry().build()
    pipe = FramePipeline(
        mips, mat_params, mat_tex, width=width, height=height,
        render_shadows=render_shadows, max_steps=max_steps,
    )

    fwd = np.array([0.45, -0.4, 0.8], np.float32)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 1.0, 0.0]).astype(np.float32)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd).astype(np.float32)

    tasks = np.zeros((pipe.picker_rays, 7), np.float32)
    tasks[:, 0] = 20.0
    tasks[:, 1:4] = (num_chunks * 16.0, 24.0, num_chunks * 16.0)
    tasks[:, 4:7] = (0.0, -1.0, 0.0)

    example_args = (
        jnp.asarray(buf),
        jnp.float32(octree_scale),
        jnp.asarray([num_chunks * 16.0, 26.0, -8.0], jnp.float32),
        jnp.asarray(right),
        jnp.asarray(up),
        jnp.asarray(fwd),
        jnp.float32(np.radians(70.0)),
        jnp.float32(width / height),
        jnp.float32(0.3),
        jnp.asarray(np.array([-1, -1, -1], np.float32) / np.sqrt(3)),
        jnp.float32(300.0),
        jnp.asarray(np.full(3, np.nan, np.float32)),
        jnp.asarray(tasks),
    )
    return pipe.frame_fn(), example_args
