"""Batched ESVO ray traversal — the core device kernel.

A functional, lane-masked port of the Laine–Karras sparse-voxel-octree
raytracer (reference: assets/shaders/svo.esvo.glsl:50-393, after
"Efficient Sparse Voxel Octrees", Laine & Karras 2010). One GLSL thread per
pixel becomes a ``(B,)`` ray batch stepped together inside a
``lax.while_loop``; rays retire by masking. All float bit tricks (mantissa
PUSH/ADVANCE/POP, findMSB multi-level ascent, signed-epsilon substitution)
are preserved exactly via bitcasts.

The SVO buffer layout consumed here is produced by
``voxelrs_tpu.world.esvo``: ``descriptors[0:5]`` preamble, then octant
blocks; ``octree_scale = 2^-depth``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .bits import (
    EPSILON,
    MAX_SCALE,
    copysign_epsilon,
    exp2i,
    f32_bits,
    find_msb,
    floor_to_scale,
    smoothstep,
)

MAX_STEPS = 1000
RELATIVE_BIT = jnp.uint32(1 << 31)


class TraversalResult(NamedTuple):
    """Per-ray hit data; ``t == -1`` means no hit
    (mirrors OctreeResult, reference: assets/shaders/svo.glsl:31-40)."""

    t: jnp.ndarray  # (B,) world-space distance, -1 = miss
    value: jnp.ndarray  # (B,) uint32 hit block id
    face_id: jnp.ndarray  # (B,) int32: 0=-x 1=+x 2=-y 3=+y 4=-z 5=+z
    pos: jnp.ndarray  # (B,3) world-space hit position
    uv: jnp.ndarray  # (B,2) face uv
    lod: jnp.ndarray  # (B,) texture lod used
    inside_voxel: jnp.ndarray  # (B,) bool
    steps: jnp.ndarray  # (B,) int32 traversal step count (diagnostics)
    trace: Optional[dict] = None  # step trace when recording (tests)


def _get_octant_ptr(descriptors, ptr, idx):
    """Resolve relative/absolute child pointer
    (reference: svo.esvo.glsl:9-16)."""
    raw = descriptors[jnp.clip(ptr + 4 + idx, 0, descriptors.shape[0] - 1)]
    rel = ptr + 4 + idx + (raw & jnp.uint32(0x7FFFFFFF))
    return jnp.where((raw & RELATIVE_BIT) != 0, rel, raw).astype(jnp.uint32)


def intersect_octree(
    descriptors: jnp.ndarray,
    octree_scale,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    max_dst,
    cast_translucent: bool,
    alpha_fn: Optional[Callable] = None,
    max_steps: int = MAX_STEPS,
    record_trace: bool = False,
) -> TraversalResult:
    """Trace a batch of rays through the serialized SVO.

    Args:
      descriptors: (N,) uint32 SVO buffer (preamble at word 0).
      octree_scale: scalar f32, 2^-depth — size of one leaf in [0,1] space.
      ro: (B,3) ray origins in world (SVO block) space.
      rd: (B,3) normalized ray directions.
      max_dst: (B,) or scalar; if >= 0 limits travel distance (world units).
      cast_translucent: static — if True, rays pass through zero-alpha texels.
      alpha_fn: (value, face_id, uv, lod) -> (B,) texel alpha; None => opaque.
      max_steps: static loop bound (reference MAX_STEPS = 1000).
      record_trace: static — record per-step state for shader-trace tests.
    """
    B = ro.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32
    u32 = jnp.uint32

    octree_scale = jnp.asarray(octree_scale, f32)
    max_dst = jnp.broadcast_to(jnp.asarray(max_dst, f32), (B,)) * octree_scale

    # rescale to [0;1], then shift to [1;2) to work on mantissa bits
    rox = ro[:, 0] * octree_scale + 1.0
    roy = ro[:, 1] * octree_scale + 1.0
    roz = ro[:, 2] * octree_scale + 1.0

    rdx = copysign_epsilon(rd[:, 0])
    rdy = copysign_epsilon(rd[:, 1])
    rdz = copysign_epsilon(rd[:, 2])

    # FMA plane-intersection coefficients on all-negative mirrored directions
    tcx = 1.0 / -jnp.abs(rdx)
    tcy = 1.0 / -jnp.abs(rdy)
    tcz = 1.0 / -jnp.abs(rdz)
    tbx = tcx * rox
    tby = tcy * roy
    tbz = tcz * roz

    # mirror positive directions; octant_mask records which axes flipped
    mirror_x = rdx > 0
    mirror_y = rdy > 0
    mirror_z = rdz > 0
    octant_mask = (
        mirror_x.astype(i32)
        | (mirror_y.astype(i32) << 1)
        | (mirror_z.astype(i32) << 2)
    )
    tbx = jnp.where(mirror_x, 3.0 * tcx - tbx, tbx)
    tby = jnp.where(mirror_y, 3.0 * tcy - tby, tby)
    tbz = jnp.where(mirror_z, 3.0 * tcz - tbz, tbz)

    # entry/exit distances of the [1;2) cube
    t_min = jnp.maximum(
        jnp.maximum(2.0 * tcx - tbx, 2.0 * tcy - tby), 2.0 * tcz - tbz
    )
    t_min = jnp.maximum(0.0, t_min)
    t_max = jnp.minimum(jnp.minimum(tcx - tbx, tcy - tby), tcz - tbz)
    h = t_max

    idx = jnp.zeros(B, i32)
    posx = jnp.ones(B, f32)
    posy = jnp.ones(B, f32)
    posz = jnp.ones(B, f32)
    in_x = t_min < 1.5 * tcx - tbx
    in_y = t_min < 1.5 * tcy - tby
    in_z = t_min < 1.5 * tcz - tbz
    idx = idx ^ in_x.astype(i32) ^ (in_y.astype(i32) << 1) ^ (in_z.astype(i32) << 2)
    posx = jnp.where(in_x, 1.5, posx)
    posy = jnp.where(in_y, 1.5, posy)
    posz = jnp.where(in_z, 1.5, posz)

    state = dict(
        step=jnp.int32(0),
        active=jnp.ones(B, bool),
        ptr=jnp.zeros(B, u32),
        parent_idx=jnp.zeros(B, i32),
        scale=jnp.full(B, MAX_SCALE - 1, i32),
        scale_exp2=jnp.full(B, 0.5, f32),
        idx=idx,
        posx=posx,
        posy=posy,
        posz=posz,
        t_min=t_min,
        t_max=t_max,
        h=h,
        last_value=jnp.full(B, 0xFFFFFFFF, u32),
        adj_count=jnp.zeros(B, i32),
        ptr_stack=jnp.zeros((B, MAX_SCALE + 1), u32),
        pidx_stack=jnp.zeros((B, MAX_SCALE + 1), i32),
        tmax_stack=jnp.zeros((B, MAX_SCALE + 1), f32),
        # results
        res_t=jnp.full(B, -1.0, f32),
        res_value=jnp.zeros(B, u32),
        res_face=jnp.zeros(B, i32),
        res_pos=jnp.zeros((B, 3), f32),
        res_uv=jnp.zeros((B, 2), f32),
        res_lod=jnp.zeros(B, f32),
        res_inside=jnp.zeros(B, bool),
        res_steps=jnp.zeros(B, i32),
    )
    if record_trace:
        state["trace_t"] = jnp.full((B, max_steps), -1.0, f32)
        state["trace_i"] = jnp.full((B, max_steps, 7), -1, i32)
        state["trace_n"] = jnp.zeros(B, i32)

    nbuf = descriptors.shape[0]

    def gather(indices):
        return descriptors[jnp.clip(indices.astype(i32), 0, nbuf - 1)]

    def body(s):
        active = s["active"]

        # early out once the distance limit is exceeded (glsl:153-156)
        active = active & ~((max_dst >= 0) & (s["t_min"] > max_dst))

        t_min, t_max = s["t_min"], s["t_max"]
        posx, posy, posz = s["posx"], s["posy"], s["posz"]
        scale_exp2 = s["scale_exp2"]

        # exit-corner distances of the current octant
        tcox = posx * tcx - tbx
        tcoy = posy * tcy - tby
        tcoz = posz * tcz - tbz
        tc_max = jnp.minimum(jnp.minimum(tcox, tcoy), tcoz)

        octant_idx = (s["idx"] ^ octant_mask).astype(u32)
        bit = (jnp.uint32(1) << octant_idx).astype(u32)

        descriptor = gather(s["ptr"] + (s["parent_idx"] // 2).astype(u32))
        descriptor = jnp.where(
            s["parent_idx"] % 2 != 0, descriptor >> jnp.uint32(16), descriptor
        )
        is_child = (descriptor & (bit << jnp.uint32(8))) != 0
        is_leaf = (descriptor & bit) != 0

        if record_trace:
            n = s["trace_n"]
            rec = active
            nc = jnp.clip(n, 0, max_steps - 1)
            tr_t = s["trace_t"].at[jnp.arange(B), nc].set(
                jnp.where(rec, t_min / octree_scale, s["trace_t"][jnp.arange(B), nc])
            )
            row = jnp.stack(
                [
                    s["ptr"].astype(i32),
                    octant_idx.astype(i32),
                    s["parent_idx"],
                    s["scale"],
                    is_child.astype(i32),
                    is_leaf.astype(i32),
                    jnp.zeros(B, i32),
                ],
                axis=-1,
            )
            tr_i = s["trace_i"].at[jnp.arange(B), nc].set(
                jnp.where(rec[:, None], row, s["trace_i"][jnp.arange(B), nc])
            )
            s = {**s, "trace_t": tr_t, "trace_i": tr_i, "trace_n": n + rec.astype(i32)}

        hit_branch = is_child & (t_min <= t_max)

        # inside-voxel flag: octree starts at a leaf with zero travel (glsl:180-182)
        res_inside = s["res_inside"] | (active & hit_branch & is_leaf & (t_min == 0))

        # ---- HIT phase (leaf with positive travel), glsl:185-265 -----------
        leaf_hit = hit_branch & is_leaf & (t_min > 0)

        next_ptr = _get_octant_ptr(descriptors, s["ptr"], s["parent_idx"].astype(u32))
        leaf_value = gather(next_ptr + 4 + octant_idx)

        # entry-corner distances: lower bound of the leaf cube
        t2x = (posx + scale_exp2) * tcx - tbx
        t2y = (posy + scale_exp2) * tcy - tby
        t2z = (posz + scale_exp2) * tcz - tbz
        tc_min = jnp.maximum(jnp.maximum(t2x, t2y), t2z)

        # undo mirroring of the hit position
        upx = jnp.where(mirror_x, 3.0 - scale_exp2 - posx, posx)
        upy = jnp.where(mirror_y, 3.0 - scale_exp2 - posy, posy)
        upz = jnp.where(mirror_z, 3.0 - scale_exp2 - posz, posz)

        sign_x = (f32_bits(rdx) >> jnp.uint32(31)).astype(i32)
        sign_y = (f32_bits(rdy) >> jnp.uint32(31)).astype(i32)
        sign_z = (f32_bits(rdz) >> jnp.uint32(31)).astype(i32)

        on_x = tc_min == t2x
        on_y = (~on_x) & (tc_min == t2y)

        face_id = jnp.where(on_x, sign_x, jnp.where(on_y, 2 | sign_y, 4 | sign_z))
        ux = jnp.where(
            on_x,
            (roz + rdz * t2x) - upz,
            jnp.where(on_y, (rox + rdx * t2y) - upx, (rox + rdx * t2z) - upx),
        )
        uy = jnp.where(
            on_x,
            (roy + rdy * t2x) - upy,
            jnp.where(on_y, (roz + rdz * t2y) - upz, (roy + rdy * t2z) - upy),
        )
        ux = ux / scale_exp2
        uy = uy / scale_exp2
        ux = jnp.where(on_x & mirror_x, 1.0 - ux, ux)
        uy = jnp.where(on_y & mirror_y, 1.0 - uy, uy)
        ux = jnp.where(~on_x & ~on_y & ~mirror_z, 1.0 - ux, ux)

        dst = t_min / octree_scale
        tex_lod = smoothstep(15.0, 25.0, dst) * (dst - 15.0) * 0.05

        if cast_translucent and alpha_fn is not None:
            alpha = alpha_fn(leaf_value, face_id, jnp.stack([ux, uy], -1), tex_lod)
        else:
            alpha = jnp.ones(B, f32)

        first_of_kind = (s["adj_count"] == 0) | (leaf_value != s["last_value"])
        opaque_ok = (alpha > 0) | (not cast_translucent)
        accept = active & leaf_hit & opaque_ok & first_of_kind

        # record results for accepted lanes; clamp hit pos into the leaf cube
        hx = jnp.clip(rox + t_min * rdx, upx + EPSILON, upx + scale_exp2 - EPSILON)
        hy = jnp.clip(roy + t_min * rdy, upy + EPSILON, upy + scale_exp2 - EPSILON)
        hz = jnp.clip(roz + t_min * rdz, upz + EPSILON, upz + scale_exp2 - EPSILON)
        hit_pos = (jnp.stack([hx, hy, hz], -1) - 1.0) / octree_scale

        res_t = jnp.where(accept, dst, s["res_t"])
        res_value = jnp.where(accept, leaf_value, s["res_value"])
        res_face = jnp.where(accept, face_id, s["res_face"])
        res_pos = jnp.where(accept[:, None], hit_pos, s["res_pos"])
        res_uv = jnp.where(accept[:, None], jnp.stack([ux, uy], -1), s["res_uv"])
        res_lod = jnp.where(accept, tex_lod, s["res_lod"])
        res_steps = jnp.where(accept, s["step"] + 1, s["res_steps"])

        # translucent pass-through: count adjacent identical leaves (glsl:263-265)
        passthrough = active & leaf_hit & ~accept
        adj_count = jnp.where(passthrough, s["adj_count"] + 1, s["adj_count"])
        last_value = jnp.where(passthrough, leaf_value, s["last_value"])
        # miss branch resets the adjacency tracking (glsl:313-317)
        miss = active & ~hit_branch
        adj_count = jnp.where(miss, 0, adj_count)
        last_value = jnp.where(miss, jnp.uint32(0xFFFFFFFF), last_value)

        active = active & ~accept

        # ---- PUSH phase (descend into child octant), glsl:266-311 ----------
        half_scale = scale_exp2 * 0.5
        t_center_x = half_scale * tcx + tcox
        t_center_y = half_scale * tcy + tcoy
        t_center_z = half_scale * tcz + tcoz
        tv_max = jnp.minimum(t_max, tc_max)

        want_push = active & hit_branch & ~(is_leaf & (t_min > 0)) & (t_min <= tv_max)

        # push stacks where tc_max < h
        do_store = want_push & (tc_max < s["h"])
        scale_c = jnp.clip(s["scale"], 0, MAX_SCALE)
        lane = jnp.arange(B)
        ptr_stack = jnp.where(
            do_store[:, None],
            s["ptr_stack"].at[lane, scale_c].set(s["ptr"]),
            s["ptr_stack"],
        )
        pidx_stack = jnp.where(
            do_store[:, None],
            s["pidx_stack"].at[lane, scale_c].set(s["parent_idx"]),
            s["pidx_stack"],
        )
        tmax_stack = jnp.where(
            do_store[:, None],
            s["tmax_stack"].at[lane, scale_c].set(t_max),
            s["tmax_stack"],
        )
        h_new = jnp.where(want_push, tc_max, s["h"])

        push_ptr = next_ptr
        push_scale = s["scale"] - 1
        push_scale_exp2 = half_scale
        push_parent_idx = octant_idx.astype(i32)

        pin_x = t_min < t_center_x
        pin_y = t_min < t_center_y
        pin_z = t_min < t_center_z
        push_idx = (
            pin_x.astype(i32) | (pin_y.astype(i32) << 1) | (pin_z.astype(i32) << 2)
        )
        push_posx = posx + jnp.where(pin_x, push_scale_exp2, 0.0)
        push_posy = posy + jnp.where(pin_y, push_scale_exp2, 0.0)
        push_posz = posz + jnp.where(pin_z, push_scale_exp2, 0.0)

        # ---- ADVANCE phase (step to next sibling), glsl:319-331 -------------
        advance = active & ~want_push

        step_x = tc_max >= tcox
        step_y = tc_max >= tcoy
        step_z = tc_max >= tcoz
        step_mask = (
            step_x.astype(i32) | (step_y.astype(i32) << 1) | (step_z.astype(i32) << 2)
        )
        adv_posx = posx - jnp.where(step_x, scale_exp2, 0.0)
        adv_posy = posy - jnp.where(step_y, scale_exp2, 0.0)
        adv_posz = posz - jnp.where(step_z, scale_exp2, 0.0)
        adv_t_min = tc_max
        adv_idx = s["idx"] ^ step_mask

        # ---- POP phase (multi-level ascent), glsl:335-391 --------------------
        need_pop = advance & ((adv_idx & step_mask) != 0)

        db = jnp.zeros(B, u32)
        db = jnp.where(
            step_x, db | (f32_bits(adv_posx) ^ f32_bits(adv_posx + scale_exp2)), db
        )
        db = jnp.where(
            step_y, db | (f32_bits(adv_posy) ^ f32_bits(adv_posy + scale_exp2)), db
        )
        db = jnp.where(
            step_z, db | (f32_bits(adv_posz) ^ f32_bits(adv_posz + scale_exp2)), db
        )
        pop_scale = find_msb(db)
        pop_scale_exp2 = exp2i(pop_scale)

        exited = need_pop & (pop_scale >= MAX_SCALE)
        active = active & ~exited
        do_pop = need_pop & ~exited

        pop_scale_c = jnp.clip(pop_scale, 0, MAX_SCALE)
        pop_ptr = ptr_stack[lane, pop_scale_c]
        pop_parent_idx = pidx_stack[lane, pop_scale_c]
        pop_t_max = tmax_stack[lane, pop_scale_c]

        fpx, shx = floor_to_scale(adv_posx, pop_scale_c)
        fpy, shy = floor_to_scale(adv_posy, pop_scale_c)
        fpz, shz = floor_to_scale(adv_posz, pop_scale_c)
        pop_idx = (
            (shx & 1) | ((shy & 1) << 1) | ((shz & 1) << 2)
        ).astype(i32)

        # ---- merge phases -----------------------------------------------------
        def sel(push_v, pop_v, adv_v, old_v):
            v = jnp.where(want_push, push_v, old_v)
            v = jnp.where(advance, adv_v, v)
            v = jnp.where(do_pop, pop_v, v)
            return v

        new = dict(s)
        new["active"] = active & (s["step"] + 1 < max_steps)
        new["step"] = s["step"] + 1
        new["ptr"] = sel(push_ptr, pop_ptr, s["ptr"], s["ptr"])
        new["parent_idx"] = sel(
            push_parent_idx, pop_parent_idx, s["parent_idx"], s["parent_idx"]
        )
        new["scale"] = sel(push_scale, pop_scale, s["scale"], s["scale"])
        new["scale_exp2"] = sel(
            push_scale_exp2, pop_scale_exp2, scale_exp2, scale_exp2
        )
        new["idx"] = sel(push_idx, pop_idx, adv_idx, s["idx"])
        new["posx"] = sel(push_posx, fpx, adv_posx, posx)
        new["posy"] = sel(push_posy, fpy, adv_posy, posy)
        new["posz"] = sel(push_posz, fpz, adv_posz, posz)
        new["t_min"] = jnp.where(advance, adv_t_min, t_min)
        new["t_max"] = sel(tv_max, pop_t_max, t_max, t_max)
        new["h"] = jnp.where(do_pop, 0.0, h_new)
        new["last_value"] = last_value
        new["adj_count"] = adj_count
        new["ptr_stack"] = ptr_stack
        new["pidx_stack"] = pidx_stack
        new["tmax_stack"] = tmax_stack
        new["res_t"] = res_t
        new["res_value"] = res_value
        new["res_face"] = res_face
        new["res_pos"] = res_pos
        new["res_uv"] = res_uv
        new["res_lod"] = res_lod
        new["res_inside"] = res_inside
        new["res_steps"] = res_steps
        if record_trace:
            new["trace_t"] = s["trace_t"]
            new["trace_i"] = s["trace_i"]
            new["trace_n"] = s["trace_n"]
        return new

    def cond(s):
        return jnp.any(s["active"]) & (s["step"] < max_steps)

    state = jax.lax.while_loop(cond, body, state)

    trace = None
    if record_trace:
        trace = {
            "t": state["trace_t"],
            "ptr": state["trace_i"][..., 0],
            "idx": state["trace_i"][..., 1],
            "parent_idx": state["trace_i"][..., 2],
            "scale": state["trace_i"][..., 3],
            "is_child": state["trace_i"][..., 4],
            "is_leaf": state["trace_i"][..., 5],
            "n": state["trace_n"],
        }

    return TraversalResult(
        t=state["res_t"],
        value=state["res_value"],
        face_id=state["res_face"],
        pos=state["res_pos"],
        uv=state["res_uv"],
        lod=state["res_lod"],
        inside_voxel=state["res_inside"],
        steps=state["res_steps"],
        trace=trace,
    )
