"""Renderer front-end: owns the device-resident SVO buffer, material table
and texture mips; exposes ``update`` (delta upload), ``render`` (full frame)
and ``raycast`` (picker batches).

TPU-native translation of reference: src/graphics/svo.rs:56-255 — the
persistently-mapped GL buffer becomes an HBM jnp array patched with
``lax.dynamic_update_slice`` on exactly the ranges the serializer changed;
GL fences become XLA dataflow ordering.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.shading import FACE_NORMALS, render_frame
from ..ops.traversal import intersect_octree
from .picker import PickerBatch, PickerBatchResult


@dataclass
class RenderParams:
    """Per-frame render inputs (reference: src/graphics/svo.rs:85-106)."""

    cam_pos: np.ndarray
    cam_fwd: np.ndarray
    cam_up: np.ndarray = field(default_factory=lambda: np.array([0, 1, 0], np.float32))
    fov_y_rad: float = np.radians(72.0)
    aspect_ratio: float = 16 / 9
    ambient_intensity: float = 0.3
    light_dir: np.ndarray = field(
        default_factory=lambda: np.array([-1, -1, -1], np.float32) / np.sqrt(3)
    )
    render_shadows: bool = True
    shadow_distance: float = 300.0
    selected_voxel: Optional[np.ndarray] = None


@dataclass
class Stats:
    used_bytes: int = 0
    capacity_bytes: int = 0
    depth: int = 0


@partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
def _apply_range(buf, update, start, _bucket):
    return jax.lax.dynamic_update_slice(buf, update, (start,))


def _bucket(n: int) -> int:
    return 1 << max(6, (n - 1).bit_length())


class Svo:
    """Device-side SVO renderer."""

    def __init__(self, registry, capacity_mb: float = 64.0, buffer_dtype=np.uint32):
        self.mips, self.mat_params, self.mat_tex = registry.build()
        self._compute_translucent_blocks()
        self.world_value_mask = ~0  # until update() reports the world's set
        self.buffer_dtype = np.dtype(buffer_dtype)
        # The host mirror is allocated at full capacity; the DEVICE buffer is
        # sized to the live world and grows on demand — gather cost on TPU
        # scales with the gather table size, so a right-sized buffer traces
        # several times faster than a mostly-empty full-capacity one.
        if self.buffer_dtype == np.uint32:
            # ESVO: u32 host mirror + device array of 12-aligned rows
            capacity = int(capacity_mb * 1_000_000) // 4
            capacity -= capacity % 12
            self.capacity_u32 = capacity
            self.host_buf = np.zeros(capacity, np.uint32)
            self.device_buf = jnp.zeros(12, jnp.uint32)
        else:
            # CSVO: byte host mirror ([root_ptr u32][node bytes...]); the
            # device holds the node bytes as u32 words (byte pointers are
            # relative to the stream start, after the 4-byte prefix)
            capacity = int(capacity_mb * 1_000_000)
            capacity -= capacity % 4
            self.capacity_u32 = capacity  # capacity in host elements (bytes)
            self.host_buf = np.zeros(capacity, np.uint8)
            self.device_buf = jnp.zeros(12, jnp.uint32)
        self.root_ptr = 0
        self.octree_scale = np.float32(1.0)
        self.depth = 0
        # optional terrain envelope for the beam pre-pass (set by the
        # systems layer / tests via set_heightfield; None = no pre-pass)
        self.heightfield = None
        cap_bytes = capacity * (4 if self.buffer_dtype == np.uint32 else 1)
        self.capacity_bytes = cap_bytes
        self.stats = Stats(capacity_bytes=cap_bytes)
        self._render_cache: dict = {}
        self._raycast_cache: dict = {}
        # picker memo: (buffer_version, tasks, results). A raycast over the
        # SAME task batch against the SAME device buffer is deterministic,
        # so replaying the previous readback is bit-exact. This is the
        # in-game fast path: the 250 Hz fixed-step physics loop raycasts an
        # IDENTICAL AABB batch every substep while the entity stands still
        # (and the look-ray repeats while the camera is still) — without
        # the memo each substep pays a full device round trip (~30-50 ms
        # over the tunnel), up to 9 syncs per rendered frame.
        self._buffer_version = 0
        self._raycast_memo = None
        self._prewarm_words = None  # next-ladder-step growth prediction

    # -- world upload ---------------------------------------------------------

    def _grow_device(self, needed_words: int, elems_per_word: int = 1) -> bool:
        """Ensure the device buffer holds ``needed_words`` u32 words, sized
        on a {2^k, 1.5*2^k} ladder of 108-word fat rows (grow-only).

        Gather cost on this TPU is tiered by table ROW count (fast below
        ~32K rows, scripts/gather_probe.py), so the traversal's fat-row view
        (buffer/108) must stay as small as the world allows — tight ~5%
        headroom beats the old 1.5x-pow2 sizing, which pushed mid-size
        worlds over the cliff. Returns True when a fresh buffer was
        allocated (full re-upload required)."""
        cur = self.device_buf.shape[0]
        if needed_words <= cur:
            # growth prediction (streaming): approaching the ladder
            # boundary → expose the NEXT step's exact shape so the render
            # path can pre-compile the fused frame for it in the
            # background (ops/shading._fused_frame_call prewarm)
            self._prewarm_words = (
                self._next_ladder_words(cur)
                if needed_words * 4 > cur * 3 else None)
            return False
        rows = max((needed_words * 21 // 20) // 108 + 1, 1024)
        p = 1 << (rows - 1).bit_length()
        bucket = p if rows > (p * 3) // 4 else (p * 3) // 4
        self.device_buf = jnp.zeros(bucket * 108, jnp.uint32)
        self._prewarm_words = None
        return True

    @staticmethod
    def _next_ladder_words(cur_words: int) -> int:
        """The buffer size the NEXT _grow_device call would allocate —
        the first {3/4*2^k, 2^k} fat-row ladder point above the current
        one."""
        rows = cur_words // 108 + 1
        p = 1 << (rows - 1).bit_length()
        bucket = p if rows > (p * 3) // 4 else (p * 3) // 4
        return bucket * 108

    def update(self, world_svo) -> None:
        """Apply the serializer's changed ranges to the device buffer
        (reference: svo.rs:171-189)."""
        prev_state = (self.depth, self.root_ptr)
        self.depth = world_svo.depth()
        self.octree_scale = np.float32(2.0 ** -self.depth) if self.depth else np.float32(1.0)

        ranges = world_svo.write_changes_to(self.host_buf, reset=True)
        if self.buffer_dtype == np.uint32:
            from ..world.esvo import PREAMBLE_LENGTH_IN_U32

            needed = world_svo.size_in_u32() + PREAMBLE_LENGTH_IN_U32
            if self._grow_device(needed, elems_per_word=1):
                ranges = [(0, needed)]  # fresh buffer: full upload
            for start, length in ranges:
                b = min(_bucket(length), self.device_buf.shape[0] - start,
                        len(self.host_buf) - start)
                if b <= 0:
                    continue
                chunk = jnp.asarray(self.host_buf[start : start + b])
                self.device_buf = _apply_range(self.device_buf, chunk, start, b)
        else:
            # byte ranges -> word ranges of the post-prefix stream
            self.root_ptr = int.from_bytes(bytes(self.host_buf[:4]), "little")
            needed_words = (world_svo.size_in_bytes() + 3) // 4 + 1
            if self._grow_device(needed_words, elems_per_word=1):
                ranges = [(4, needed_words * 4)]
            n_words = self.device_buf.shape[0]
            for start, length in ranges:
                ws = max(0, (start - 4) // 4)
                we = min(n_words, ((start - 4 + length) + 3) // 4 + 1)
                if we <= ws:
                    continue
                b = min(_bucket(we - ws), n_words - ws)
                chunk = jnp.asarray(
                    self.host_buf[4 + ws * 4 : 4 + (ws + b) * 4].view(np.uint32)
                )
                self.device_buf = _apply_range(self.device_buf, chunk, ws, b)

        if ranges or (self.depth, self.root_ptr) != prev_state:
            self._buffer_version += 1  # invalidate the picker memo
        self.world_value_mask = getattr(world_svo, "value_mask", ~0)
        self.stats = Stats(
            used_bytes=world_svo.size_in_bytes(),
            capacity_bytes=self.capacity_bytes,
            depth=self.depth,
        )

    # -- rendering --------------------------------------------------------------

    def reload_resources(self, registry) -> None:
        """Rebuild textures + materials (the reference's hot-reload path,
        svo.rs:155-168); cached render programs keep working — arrays are
        call arguments, not compile-time constants."""
        self.mips, self.mat_params, self.mat_tex = registry.build()
        self._compute_translucent_blocks()

    def _compute_translucent_blocks(self) -> None:
        """Bitmask of block values whose face textures contain any texel
        with alpha < 1. When the world provably contains none of them,
        translucent casting degenerates to first-hit casting and the
        renderer uses the leaner opaque pipeline (no per-round alpha
        judging, no shadow finalize)."""
        alpha0 = np.asarray(self.mips[0][..., 3])
        layer_translucent = (alpha0 < 1.0).any(axis=(1, 2))
        mat_tex = np.asarray(self.mat_tex)
        mask = 0
        for block in range(mat_tex.shape[0]):
            layers = mat_tex[block, 0:3]
            if any(l >= 0 and layer_translucent[l] for l in layers):
                mask |= 1 << min(block, 63)
        mask |= 1 << 63  # unknown/overflow values count as translucent
        self.translucent_block_mask = mask

    def render(self, params: RenderParams, width: int, height: int,
               max_steps: int = 1000, mode: str = "deferred") -> np.ndarray:
        """Render one frame; returns an (H, W, 4) float32 image (row 0 = top).

        ``mode="deferred"`` (default) runs the host-orchestrated pipeline —
        traversal at one gather/step with between-round alpha judgement —
        for BOTH buffer formats (the CSVO engine reads the byte stream per
        step; see ops/traversal_csvo.py). ``mode="fused"`` traces the whole
        frame as one XLA program (in-loop alpha, used by the sharded
        multi-chip path); for CSVO buffers it selects the fused CSVO
        kernel."""
        if self.buffer_dtype != np.uint32 and mode != "deferred":
            mode = "csvo"
        from .camera import Camera

        cam = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio, 0.01, 1024)
        cam.position = np.asarray(params.cam_pos, np.float32)
        cam.forward = np.asarray(params.cam_fwd, np.float32)
        cam.up = np.asarray(params.cam_up, np.float32)
        s, u, f = cam.camera_basis()

        highlight = (
            np.asarray(params.selected_voxel, np.float32)
            if params.selected_voxel is not None
            else np.full(3, np.nan, np.float32)
        )

        if mode == "deferred":
            from ..ops.shading import render_frame_deferred

            beams = self._beam_floors(cam, s, u, f, params, width, height)

            if self.buffer_dtype == np.uint32:
                engine = "esvo"
                descriptors = self.device_buf
                stack_h = min(12, max(self.depth, 1) + 1)
            else:
                engine = "csvo"
                descriptors = (self.device_buf, jnp.uint32(self.root_ptr),
                               jnp.int32(self.depth))
                # full height: inside-voxel rays descend below leaf scale
                stack_h = 12

            prewarm = None
            if (self._prewarm_words is not None
                    and self._prewarm_words > self.device_buf.shape[0]):
                grown = jax.ShapeDtypeStruct((self._prewarm_words,),
                                             jnp.uint32)
                prewarm = (grown if self.buffer_dtype == np.uint32 else
                           (grown,) + tuple(descriptors[1:]))

            return render_frame_deferred(
                descriptors, jnp.float32(self.octree_scale), self.mips,
                self.mat_params, self.mat_tex, width=width, height=height,
                render_shadows=bool(params.render_shadows),
                cam_pos=jnp.asarray(cam.position), cam_right=jnp.asarray(s),
                cam_up=jnp.asarray(u), cam_fwd=jnp.asarray(f),
                fov_y_rad=jnp.float32(params.fov_y_rad),
                aspect=jnp.float32(params.aspect_ratio),
                ambient=jnp.float32(params.ambient_intensity),
                light_dir=jnp.asarray(params.light_dir, jnp.float32),
                shadow_distance=jnp.float32(params.shadow_distance),
                highlight_pos=jnp.asarray(highlight), max_steps=max_steps,
                opaque=(self.world_value_mask & self.translucent_block_mask) == 0,
                stack_height=stack_h, engine=engine, beams=beams,
                prewarm_descriptors=prewarm,
            )

        if mode == "csvo":
            from ..ops.traversal_csvo import intersect_octree_csvo

            key = (width, height, bool(params.render_shadows), max_steps,
                   "csvo", self.depth)
            if key not in self._render_cache:
                depth = self.depth

                def fn_csvo(buf, scale, root_ptr, mips, mat_params, mat_tex,
                            cam_pos, cam_right, cam_up, cam_fwd, fov, aspect,
                            ambient, light_dir, shadow_distance, hl):
                    def traverse(ro, rd, max_dst, cast_translucent, alpha_fn):
                        return intersect_octree_csvo(
                            buf, scale, root_ptr, depth, ro, rd, max_dst,
                            cast_translucent, alpha_fn=alpha_fn,
                            max_steps=key[3],
                        )

                    return render_frame(
                        buf, scale, mips, mat_params, mat_tex,
                        width=key[0], height=key[1], render_shadows=key[2],
                        cam_pos=cam_pos, cam_right=cam_right, cam_up=cam_up,
                        cam_fwd=cam_fwd, fov_y_rad=fov, aspect=aspect,
                        ambient=ambient, light_dir=light_dir,
                        shadow_distance=shadow_distance, highlight_pos=hl,
                        max_steps=key[3], traverse=traverse,
                    )

                self._render_cache[key] = jax.jit(fn_csvo)

            return self._render_cache[key](
                self.device_buf, jnp.float32(self.octree_scale),
                jnp.uint32(self.root_ptr), self.mips, self.mat_params,
                self.mat_tex, jnp.asarray(cam.position), jnp.asarray(s),
                jnp.asarray(u), jnp.asarray(f), jnp.float32(params.fov_y_rad),
                jnp.float32(params.aspect_ratio),
                jnp.float32(params.ambient_intensity),
                jnp.asarray(params.light_dir, jnp.float32),
                jnp.float32(params.shadow_distance), jnp.asarray(highlight),
            )

        key = (width, height, bool(params.render_shadows), max_steps)
        if key not in self._render_cache:
            def fn(buf, scale, mips, mat_params, mat_tex, cam_pos, cam_right,
                   cam_up, cam_fwd, fov, aspect, ambient, light_dir,
                   shadow_distance, highlight):
                return render_frame(
                    buf, scale, mips, mat_params, mat_tex,
                    width=key[0], height=key[1], render_shadows=key[2],
                    cam_pos=cam_pos, cam_right=cam_right, cam_up=cam_up,
                    cam_fwd=cam_fwd, fov_y_rad=fov, aspect=aspect,
                    ambient=ambient, light_dir=light_dir,
                    shadow_distance=shadow_distance, highlight_pos=highlight,
                    max_steps=key[3],
                )

            self._render_cache[key] = jax.jit(fn)

        highlight = (
            np.asarray(params.selected_voxel, np.float32)
            if params.selected_voxel is not None
            else np.full(3, np.nan, np.float32)
        )
        img = self._render_cache[key](
            self.device_buf, jnp.float32(self.octree_scale), self.mips,
            self.mat_params, self.mat_tex,
            jnp.asarray(cam.position), jnp.asarray(s), jnp.asarray(u),
            jnp.asarray(f), jnp.float32(params.fov_y_rad),
            jnp.float32(params.aspect_ratio),
            jnp.float32(params.ambient_intensity),
            jnp.asarray(params.light_dir, jnp.float32),
            jnp.float32(params.shadow_distance), jnp.asarray(highlight),
        )
        return img

    def render_sharded(self, mesh, params: RenderParams, width: int,
                       height: int, max_steps: int = 1000) -> np.ndarray:
        """Render one frame with image rows SPMD over a device mesh —
        the PRODUCTION deferred/adaptive pipeline per row slab (see
        parallel.mesh.render_frame_deferred_sharded), beams included.
        Opaque worlds only (translucent frames use the fused classic
        kernel via ``parallel.mesh.render_frame_sharded``)."""
        from ..parallel.mesh import render_frame_deferred_sharded
        from .camera import Camera

        cam = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio,
                     0.01, 1024)
        cam.position = np.asarray(params.cam_pos, np.float32)
        cam.forward = np.asarray(params.cam_fwd, np.float32)
        cam.up = np.asarray(params.cam_up, np.float32)
        s, u, f = cam.camera_basis()
        beams = self._beam_floors(cam, s, u, f, params, width, height)
        if self.buffer_dtype == np.uint32:
            engine = "esvo"
            descriptors = self.device_buf
            stack_h = min(12, max(self.depth, 1) + 1)
        else:
            engine = "csvo"
            descriptors = (self.device_buf, jnp.uint32(self.root_ptr),
                           jnp.int32(self.depth))
            stack_h = 12
        highlight = (
            np.asarray(params.selected_voxel, np.float32)
            if params.selected_voxel is not None
            else np.full(3, np.nan, np.float32)
        )
        return render_frame_deferred_sharded(
            mesh, descriptors, jnp.float32(self.octree_scale), self.mips,
            self.mat_params, self.mat_tex, width=width, height=height,
            render_shadows=bool(params.render_shadows),
            cam_pos=jnp.asarray(cam.position), cam_right=jnp.asarray(s),
            cam_up=jnp.asarray(u), cam_fwd=jnp.asarray(f),
            fov_y_rad=jnp.float32(params.fov_y_rad),
            aspect=jnp.float32(params.aspect_ratio),
            ambient=jnp.float32(params.ambient_intensity),
            light_dir=jnp.asarray(params.light_dir, jnp.float32),
            shadow_distance=jnp.float32(params.shadow_distance),
            highlight_pos=jnp.asarray(highlight), max_steps=max_steps,
            stack_height=stack_h, engine=engine, beams=beams,
        )

    def set_heightfield(self, hf) -> None:
        """Attach a world/heightfield.HeightField — enables the beam
        pre-pass (conservative per-tile ray-entry floors; bit-exact
        output). ``None`` disables it."""
        self.heightfield = hf

    def render_batch(self, params_list, width: int, height: int,
                     max_steps: int = 1000):
        """Render a pose sequence as ONE fused XLA program (the benchmark
        fly-through path — amortizes the measured ~46 ms per-dispatch
        launch/args/fence floor across the batch; see
        ops/shading.render_frames_opaque_batch). Returns (N, H, W, 4)
        images, or None until every wavefront plan is recorded (callers
        fall back to per-frame ``render``, which records them). Only the
        opaque ESVO fused path batches; other configurations return
        None."""
        import os

        from ..ops.shading import (_fused_frame_on,
                                   render_frames_opaque_batch)

        if (self.buffer_dtype != np.uint32 or not _fused_frame_on()
                or (self.world_value_mask & self.translucent_block_mask)):
            return None
        from .camera import Camera

        cams, floors = [], []
        beams0 = None
        for i, params in enumerate(params_list):
            cam = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio,
                         0.01, 1024)
            cam.position = np.asarray(params.cam_pos, np.float32)
            cam.forward = np.asarray(params.cam_fwd, np.float32)
            cam.up = np.asarray(params.cam_up, np.float32)
            s, u, f = cam.camera_basis()
            cams.append((cam.position, s, u, f))
            b = self._beam_floors(cam, s, u, f, params, width, height,
                                  shared_sun=(beams0._sun if beams0
                                              else None))
            if i == 0:
                beams0 = b
            if b is not None:
                floors.append(b.t_floor)
        if beams0 is not None and len(floors) != len(params_list):
            return None  # mixed beam availability: fall back
        p0 = params_list[0]
        highlight = np.full(3, np.nan, np.float32)
        cam_stack = tuple(
            jnp.stack([jnp.asarray(c[j], jnp.float32) for c in cams])
            for j in range(4)
        )
        tf_stack = jnp.stack(floors) if floors else None
        stack_h = min(12, max(self.depth, 1) + 1)
        return render_frames_opaque_batch(
            self.device_buf, jnp.float32(self.octree_scale), self.mips,
            self.mat_params, self.mat_tex, cam_stack,
            jnp.float32(p0.fov_y_rad), jnp.float32(p0.aspect_ratio),
            jnp.float32(p0.ambient_intensity),
            jnp.asarray(p0.light_dir, jnp.float32),
            jnp.float32(p0.shadow_distance), jnp.asarray(highlight),
            width=width, height=height,
            render_shadows=bool(p0.render_shadows), max_steps=max_steps,
            stack_height=stack_h, engine="esvo", beams_shared=beams0,
            t_floor_stack=tf_stack,
        )

    def _beam_floors(self, cam, s, u, f, params, width: int, height: int,
                     shared_sun=None):
        """ops.beams.BeamContext for this frame (primary pixel floors +
        shadow-floor machinery), or None when the pre-pass is
        unavailable/disabled. ``shared_sun``: reuse an already-built sun
        map (batch rendering — certificates are exact wherever their
        window covers, so window placement never changes output)."""
        import os

        if (self.heightfield is None or width < 16 or height < 16
                or os.environ.get("VOXELRS_BEAMS") == "0"):
            return None
        dev = self.heightfield.device()
        if dev is None:
            return None
        from ..ops.beams import (CELL, BeamContext, pixel_floors,
                                 tile_floors)

        levels, offsets, n, hmax, bounds = dev[:5]
        ccx = int(np.floor(cam.position[0] / CELL)) - 2
        ccz = int(np.floor(cam.position[2] / CELL)) - 2
        near = self.heightfield.near_window(ccx + 2, ccz + 2).astype(
            np.float32)
        tf = tile_floors(
            levels, offsets=offsets, n=n, hmax=jnp.float32(hmax),
            bounds=jnp.asarray(bounds), near_h=jnp.asarray(near),
            near_base=jnp.asarray(np.array([ccx, ccz], np.float32)),
            cam_pos=jnp.asarray(cam.position, jnp.float32),
            cam_right=jnp.asarray(s, jnp.float32),
            cam_up=jnp.asarray(u, jnp.float32),
            cam_fwd=jnp.asarray(f, jnp.float32),
            fov_y_rad=jnp.float32(params.fov_y_rad),
            aspect=jnp.float32(params.aspect_ratio),
            max_dst=jnp.float32(-1.0), width=width, height=height,
        )
        sun = shared_sun
        if (sun is None and params.render_shadows
                and os.environ.get("VOXELRS_SUN") != "0"):
            sun = self.heightfield.sun_map(params.light_dir,
                                           center=params.cam_pos)
        return BeamContext(
            pixel_floors(tf, width=width, height=height), dev, width,
            height, sun=sun,
        )

    # -- picking -------------------------------------------------------------

    def _raycast_fn(self, n_pad: int):
        csvo_depth = self.depth if self.buffer_dtype != np.uint32 else None
        cache_key = (n_pad, csvo_depth)
        if cache_key not in self._raycast_cache:
            # picker casts are opaque (cast_translucent=False)

            def fn(buf, scale, root_ptr, tasks):
                ro = tasks[:, 1:4]
                rd = tasks[:, 4:7]
                if csvo_depth is not None:
                    from ..ops.traversal_csvo import intersect_octree_csvo

                    res = intersect_octree_csvo(
                        buf, scale, root_ptr, csvo_depth, ro, rd,
                        tasks[:, 0], False,
                    )
                else:
                    res = intersect_octree(buf, scale, ro, rd, tasks[:, 0], False)
                hit = res.t > 0
                dst = jnp.where(hit, res.t, -1.0)
                pos = jnp.where(hit[:, None], res.pos, 0.0)
                from ..ops.smalltab import small_lookup

                normal = jnp.where(
                    hit[:, None],
                    small_lookup(FACE_NORMALS, res.face_id),
                    0.0,
                )
                return dst, res.inside_voxel & hit, pos, normal

            self._raycast_cache[cache_key] = jax.jit(fn)
        return self._raycast_cache[cache_key]

    def raycast(self, batch: PickerBatch, result: PickerBatchResult) -> None:
        """Run the picker traversal over the batch
        (reference: svo.rs:233-255 + picker.glsl:30-51)."""
        tasks = batch.serialize_tasks()
        n = len(tasks)
        if n == 0:
            return
        if self._raycast_memo is None or \
                self._raycast_memo[0] != self._buffer_version:
            self._raycast_memo = (self._buffer_version, {})
        memo = self._raycast_memo[1]
        key = (tasks.shape[0], tasks.tobytes())
        hit = memo.get(key)
        if hit is not None:
            # hand out copies: result objects hold views into these arrays
            batch.deserialize_results(*(a.copy() for a in hit), result)
            return
        n_pad = 1 << max(3, (n - 1).bit_length())
        padded = np.zeros((n_pad, 7), np.float32)
        padded[:n] = tasks
        padded[n:, 4] = 1.0  # valid dir for padding lanes
        dst, inside, pos, normal = self._raycast_fn(n_pad)(
            self.device_buf, jnp.float32(self.octree_scale),
            jnp.uint32(self.root_ptr), jnp.asarray(padded)
        )
        if len(memo) >= 16:  # bound the per-version entries
            memo.clear()
        res = (np.asarray(dst)[:n], np.asarray(inside)[:n],
               np.asarray(pos)[:n], np.asarray(normal)[:n])
        memo[key] = res
        batch.deserialize_results(*(a.copy() for a in res), result)

    def get_stats(self) -> Stats:
        return self.stats
