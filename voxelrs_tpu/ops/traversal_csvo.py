"""Batched CSVO ray traversal — the compressed-format kernel.

Same Laine–Karras loop skeleton as ``traversal.py`` but reading the
byte-compressed CSVO node stream (reference: assets/shaders/svo.csvo.glsl):
unaligned byte reads from the u32 buffer, 2-bit pointer-size header decode
with popcount-style offset accumulation, per-chunk material sections
resolved on chunk-boundary crossings, and a depth counter (restored from a
stack on POP) selecting the node kind.

CSVO trades buffer size for extra reads: each step costs ~2 unaligned u32
fetches vs ESVO's single row gather, so ESVO remains the performance
format; CSVO is the memory-compact option (reference defaults to CSVO for
the same tradeoff reversed on GPUs, where bandwidth beats latency).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .bits import EPSILON, MAX_SCALE, copysign_epsilon, f32_bits, find_msb, smoothstep
from .traversal import TraversalResult, _exp2_scale

MAX_STEPS = 1000
INVALID_PTR = jnp.uint32(0xFFFFFFFF)
# ptr | depth << 27 packing limits the CSVO byte buffer to 128 MiB
DEPTH_SHIFT = 27
PTR_MASK = jnp.uint32((1 << DEPTH_SHIFT) - 1)
STACK_HEIGHT = 12


def intersect_octree_csvo(
    words: jnp.ndarray,
    octree_scale,
    root_ptr,
    total_depth,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    max_dst,
    cast_translucent: bool,
    alpha_fn: Optional[Callable] = None,
    max_steps: int = MAX_STEPS,
    unroll: int = 2,
) -> TraversalResult:
    """Trace rays through the CSVO byte stream.

    Args:
      words: (N,) uint32 — the node byte stream (after the 4-byte root-offset
        prefix) reinterpreted as little-endian u32 words.
      octree_scale: scalar f32 = 2^-total_depth.
      root_ptr: scalar — byte offset of the root node inside the stream.
      total_depth: scalar int — world depth (root levels + chunk lod).
      Everything else matches ``intersect_octree``.
    """
    B = ro.shape[0]
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    H = STACK_HEIGHT
    stack_base = MAX_SCALE - H

    octree_scale = jnp.asarray(octree_scale, f32)
    max_dst = jnp.broadcast_to(jnp.asarray(max_dst, f32), (B,)) * octree_scale
    nwords = words.shape[0]

    def word(i):
        return words[jnp.clip(i.astype(i32), 0, nwords - 1)]

    def read_u32(byte_ptr):
        """Unaligned 4-byte read (reference: svo.csvo.glsl:25-35)."""
        index = byte_ptr // 4
        mod = (byte_ptr % 4).astype(u32)
        lo = word(index)
        hi = word(index + 1)
        sh = mod * 8
        lo_part = jnp.where(mod == 0, lo, lo >> sh)
        hi_part = jnp.where(mod == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
        return (lo_part | hi_part).astype(u32)

    def read_u16(byte_ptr):
        return read_u32(byte_ptr) & jnp.uint32(0xFFFF)

    def read_byte(byte_ptr):
        index = byte_ptr // 4
        mod = (byte_ptr % 4).astype(u32)
        return (word(index) >> (mod * 8)) & jnp.uint32(0xFF)

    def popcount(x):
        return jax.lax.population_count(x.astype(u32)).astype(u32)

    def tag_bytes(header, upto):
        """Sum of pointer byte-widths for children with idx < upto
        ((1 << tag) >> 1 per 2-bit tag, reference: glsl:63-84)."""
        total = jnp.zeros_like(header)
        for k in range(8):
            tag = (header >> jnp.uint32(2 * k)) & jnp.uint32(3)
            width = (jnp.uint32(1) << tag) >> jnp.uint32(1)
            total = total + jnp.where(k < upto, width, 0).astype(u32)
        return total

    def read_next_ptr(ptr, depth, idx):
        """Child pointer for node kind by depth; returns
        (next_ptr | INVALID, crossed_boundary). Reference: glsl:53-116."""
        # internal nodes (depth > 3)
        header16 = read_u16(ptr)
        tag = (header16 >> (idx * jnp.uint32(2))) & jnp.uint32(3)
        off_internal = tag_bytes(header16, idx)
        ptr_bytes = tag_bytes(header16, jnp.full_like(idx, 8))
        raw = read_u32(ptr + 2 + off_internal)
        width_mask = jnp.where(
            tag >= 3,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (((jnp.uint32(1) << tag) >> 1) * 8)) - 1,
        )
        raw = raw & width_mask
        crossed = (tag == 3) & ((raw & jnp.uint32(1 << 31)) != 0)
        internal_ptr = jnp.where(
            crossed, raw ^ jnp.uint32(1 << 31), ptr + 2 + ptr_bytes + raw
        )
        internal_valid = tag != 0

        # byte-masked nodes (depth <= 3)
        header8 = read_byte(ptr)
        bit_set = (header8 >> idx) & jnp.uint32(1)
        rank = popcount(header8 & ((jnp.uint32(1) << idx) - 1))
        n_children = popcount(header8)

        # pre-leaf (depth == 3): u8 offsets after the mask byte
        pre_off = read_byte(ptr + 1 + rank)
        pre_ptr = ptr + 1 + n_children + pre_off

        # lnode (depth == 2): leaf nodes after mask + u16 material offset
        leaf_ptr = ptr + 1 + 2 + rank

        byte_ptr_sel = jnp.where(depth == 3, pre_ptr, leaf_ptr)
        byte_valid = bit_set != 0

        nxt = jnp.where(depth > 3, internal_ptr, byte_ptr_sel).astype(u32)
        valid = jnp.where(depth > 3, internal_valid, byte_valid)
        crossed = crossed & (depth > 3)
        return jnp.where(valid, nxt, INVALID_PTR), crossed

    def read_leaf(mat_ptr, pre_leaf_ptr, ptr, idx):
        """Material for a leaf bit: count preceding leaves across the lnode's
        leaf bytes, index the material section (reference: glsl:119-133)."""
        mat_off = read_u16(pre_leaf_ptr + 1)
        leaf_index = (ptr - (pre_leaf_ptr + 3)).astype(i32)
        bit_mark = leaf_index * 8 + idx.astype(i32)

        m0 = jnp.where(
            bit_mark >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << jnp.clip(bit_mark, 0, 31).astype(u32)) - 1,
        )
        v0 = read_u32(pre_leaf_ptr + 3) & m0
        over = jnp.clip(bit_mark - 32, 0, 31)
        m1 = jnp.where(
            bit_mark - 32 >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << over.astype(u32)) - 1,
        )
        m1 = jnp.where(bit_mark - 32 <= 0, jnp.uint32(0), m1)
        v1 = read_u32(pre_leaf_ptr + 3 + 4) & m1
        preceding = popcount(v0) + popcount(v1)
        return read_u32(mat_ptr + mat_off * 4 + preceding * 4)

    # ---- ray setup (identical to the ESVO kernel) ---------------------------
    rox = ro[:, 0] * octree_scale + 1.0
    roy = ro[:, 1] * octree_scale + 1.0
    roz = ro[:, 2] * octree_scale + 1.0
    rdx = copysign_epsilon(rd[:, 0])
    rdy = copysign_epsilon(rd[:, 1])
    rdz = copysign_epsilon(rd[:, 2])
    tcx, tcy, tcz = 1.0 / -jnp.abs(rdx), 1.0 / -jnp.abs(rdy), 1.0 / -jnp.abs(rdz)
    tbx, tby, tbz = tcx * rox, tcy * roy, tcz * roz
    mirror_x, mirror_y, mirror_z = rdx > 0, rdy > 0, rdz > 0
    octant_mask = (
        mirror_x.astype(i32) | (mirror_y.astype(i32) << 1) | (mirror_z.astype(i32) << 2)
    )
    tbx = jnp.where(mirror_x, 3.0 * tcx - tbx, tbx)
    tby = jnp.where(mirror_y, 3.0 * tcy - tby, tby)
    tbz = jnp.where(mirror_z, 3.0 * tcz - tbz, tbz)
    t_min0 = jnp.maximum(
        jnp.maximum(2.0 * tcx - tbx, 2.0 * tcy - tby), 2.0 * tcz - tbz
    )
    t_min0 = jnp.maximum(0.0, t_min0)
    t_max0 = jnp.minimum(jnp.minimum(tcx - tbx, tcy - tby), tcz - tbz)
    in_x = t_min0 < 1.5 * tcx - tbx
    in_y = t_min0 < 1.5 * tcy - tby
    in_z = t_min0 < 1.5 * tcz - tbz
    idx0 = in_x.astype(i32) | (in_y.astype(i32) << 1) | (in_z.astype(i32) << 2)

    def hit_phase(pd, idx, scale, posx, posy, posz, t_min, mat_ptr, pre_leaf):
        ptr = pd & PTR_MASK
        octant_idx = (idx ^ octant_mask).astype(u32)
        scale_exp2 = _exp2_scale(scale)
        leaf_value = read_leaf(mat_ptr, pre_leaf, ptr, octant_idx)

        t2x = (posx + scale_exp2) * tcx - tbx
        t2y = (posy + scale_exp2) * tcy - tby
        t2z = (posz + scale_exp2) * tcz - tbz
        tc_min = jnp.maximum(jnp.maximum(t2x, t2y), t2z)
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
            on_x, (roz + rdz * t2x) - upz,
            jnp.where(on_y, (rox + rdx * t2y) - upx, (rox + rdx * t2z) - upx),
        )
        uy = jnp.where(
            on_x, (roy + rdy * t2x) - upy,
            jnp.where(on_y, (roz + rdz * t2y) - upz, (roy + rdy * t2z) - upy),
        )
        ux = ux / scale_exp2
        uy = uy / scale_exp2
        ux = jnp.where(on_x & mirror_x, 1.0 - ux, ux)
        uy = jnp.where(on_y & mirror_y, 1.0 - uy, uy)
        ux = jnp.where(~on_x & ~on_y & ~mirror_z, 1.0 - ux, ux)
        dst = t_min / octree_scale
        tex_lod = smoothstep(15.0, 25.0, dst) * (dst - 15.0) * 0.05
        return leaf_value, face_id, ux, uy, dst, tex_lod, (upx, upy, upz)

    def step(s):
        (active, hit, inside, pd, idx, scale, posx, posy, posz, t_min, t_max,
         h, adj_last, mat_ptr, pre_leaf, stack_pd, stack_tmax) = s

        ptr = pd & PTR_MASK
        depth = (pd >> DEPTH_SHIFT).astype(i32)
        scale_exp2 = _exp2_scale(scale)
        adj_count = (adj_last >> 24).astype(i32)
        last_value = adj_last & jnp.uint32(0x00FFFFFF)

        active = active & ~((max_dst >= 0) & (t_min > max_dst))

        tcox = posx * tcx - tbx
        tcoy = posy * tcy - tby
        tcoz = posz * tcz - tbz
        tc_max = jnp.minimum(jnp.minimum(tcox, tcoy), tcoz)

        octant_idx = (idx ^ octant_mask).astype(u32)
        next_ptr, crossed = read_next_ptr(ptr, depth, octant_idx)
        is_child = next_ptr != INVALID_PTR
        is_leaf = is_child & (depth < 2)

        pre_leaf = jnp.where(active & (depth == 2), ptr, pre_leaf)

        hit_branch = is_child & (t_min <= t_max)
        inside = inside | (active & hit_branch & is_leaf & (t_min == 0))
        leaf_hit = hit_branch & is_leaf & (t_min > 0)

        if cast_translucent and alpha_fn is not None:
            leaf_value, face_id, ux, uy, _, tex_lod, _ = hit_phase(
                pd, idx, scale, posx, posy, posz, t_min, mat_ptr, pre_leaf
            )
            alpha = alpha_fn(leaf_value, face_id, jnp.stack([ux, uy], -1), tex_lod)
            first_of_kind = (adj_count == 0) | (
                (leaf_value & jnp.uint32(0x00FFFFFF)) != last_value
            )
            accept = active & leaf_hit & (alpha > 0) & first_of_kind
            passthrough = active & leaf_hit & ~accept
            adj_count = jnp.where(passthrough, jnp.minimum(adj_count + 1, 255), adj_count)
            last_value = jnp.where(
                passthrough, leaf_value & jnp.uint32(0x00FFFFFF), last_value
            )
        else:
            accept = active & leaf_hit

        miss = active & ~hit_branch
        adj_count = jnp.where(miss, 0, adj_count)
        last_value = jnp.where(miss, jnp.uint32(0x00FFFFFF), last_value)
        adj_last = (adj_count.astype(u32) << 24) | last_value

        hit = hit | accept
        active = active & ~accept

        # PUSH
        half_scale = scale_exp2 * 0.5
        t_center_x = half_scale * tcx + tcox
        t_center_y = half_scale * tcy + tcoy
        t_center_z = half_scale * tcz + tcoz
        tv_max = jnp.minimum(t_max, tc_max)
        want_push = active & hit_branch & ~(is_leaf & (t_min > 0)) & (t_min <= tv_max)

        slot = scale - stack_base
        lv = jnp.arange(H, dtype=i32)[:, None] == slot[None, :]
        do_store = (want_push & (tc_max < h))[None, :] & lv
        stack_pd = jnp.where(do_store, pd[None, :], stack_pd)
        stack_tmax = jnp.where(do_store, t_max[None, :], stack_tmax)
        h_new = jnp.where(want_push, tc_max, h)

        # chunk-boundary crossing: read blob header, jump into node stream
        # (reference: glsl:397-409)
        blob_lod = read_byte(next_ptr)
        blob_mat_bytes = read_u32(next_ptr + 1)
        crossed_nodes = next_ptr + 5 + blob_mat_bytes
        push_depth = jnp.where(
            crossed, blob_lod.astype(i32), depth - 1
        )
        push_ptr = jnp.where(crossed, crossed_nodes, next_ptr)
        push_mat_ptr = jnp.where(crossed & want_push, next_ptr + 5, mat_ptr)
        push_pd = (push_ptr & PTR_MASK) | (push_depth.astype(u32) << DEPTH_SHIFT)
        push_scale = scale - 1

        pin_x = t_min < t_center_x
        pin_y = t_min < t_center_y
        pin_z = t_min < t_center_z
        push_idx = pin_x.astype(i32) | (pin_y.astype(i32) << 1) | (pin_z.astype(i32) << 2)
        push_posx = posx + jnp.where(pin_x, half_scale, 0.0)
        push_posy = posy + jnp.where(pin_y, half_scale, 0.0)
        push_posz = posz + jnp.where(pin_z, half_scale, 0.0)

        # ADVANCE
        advance = active & ~want_push
        step_x = tc_max >= tcox
        step_y = tc_max >= tcoy
        step_z = tc_max >= tcoz
        step_mask = step_x.astype(i32) | (step_y.astype(i32) << 1) | (step_z.astype(i32) << 2)
        adv_posx = posx - jnp.where(step_x, scale_exp2, 0.0)
        adv_posy = posy - jnp.where(step_y, scale_exp2, 0.0)
        adv_posz = posz - jnp.where(step_z, scale_exp2, 0.0)
        adv_idx = idx ^ step_mask

        # POP
        need_pop = advance & ((adv_idx & step_mask) != 0)
        db = jnp.zeros(B, u32)
        db = jnp.where(step_x, db | (f32_bits(adv_posx) ^ f32_bits(adv_posx + scale_exp2)), db)
        db = jnp.where(step_y, db | (f32_bits(adv_posy) ^ f32_bits(adv_posy + scale_exp2)), db)
        db = jnp.where(step_z, db | (f32_bits(adv_posz) ^ f32_bits(adv_posz + scale_exp2)), db)
        pop_scale = find_msb(db)
        exited = need_pop & (pop_scale >= MAX_SCALE)
        active = active & ~exited
        do_pop = need_pop & ~exited

        pop_slot = jnp.clip(pop_scale - stack_base, 0, H - 1)
        pop_lv = jnp.arange(H, dtype=i32)[:, None] == pop_slot[None, :]
        pop_pd = jnp.where(pop_lv, stack_pd, 0).sum(axis=0).astype(u32)
        pop_t_max = jnp.where(pop_lv, stack_tmax, 0.0).sum(axis=0)

        sc = jnp.clip(pop_scale, 0, MAX_SCALE).astype(u32)
        shx = f32_bits(adv_posx) >> sc
        shy = f32_bits(adv_posy) >> sc
        shz = f32_bits(adv_posz) >> sc
        pop_posx = jax.lax.bitcast_convert_type(shx << sc, f32)
        pop_posy = jax.lax.bitcast_convert_type(shy << sc, f32)
        pop_posz = jax.lax.bitcast_convert_type(shz << sc, f32)
        pop_idx = ((shx & 1) | ((shy & 1) << 1) | ((shz & 1) << 2)).astype(i32)

        def sel(push_v, pop_v, adv_v, old_v):
            v = jnp.where(want_push, push_v, old_v)
            v = jnp.where(advance, adv_v, v)
            v = jnp.where(do_pop, pop_v, v)
            return v

        pd = sel(push_pd, pop_pd, pd, pd)
        idx = sel(push_idx, pop_idx, adv_idx, idx)
        scale = sel(push_scale, pop_scale, scale, scale)
        posx = sel(push_posx, pop_posx, adv_posx, posx)
        posy = sel(push_posy, pop_posy, adv_posy, posy)
        posz = sel(push_posz, pop_posz, adv_posz, posz)
        t_min = jnp.where(advance, tc_max, t_min)
        t_max = sel(tv_max, pop_t_max, t_max, t_max)
        h = jnp.where(do_pop, 0.0, h_new)
        mat_ptr = push_mat_ptr

        return (active, hit, inside, pd, idx, scale, posx, posy, posz, t_min,
                t_max, h, adj_last, mat_ptr, pre_leaf, stack_pd, stack_tmax)

    posx0 = jnp.where(in_x, 1.5, 1.0).astype(f32)
    posy0 = jnp.where(in_y, 1.5, 1.0).astype(f32)
    posz0 = jnp.where(in_z, 1.5, 1.0).astype(f32)
    depth0 = jnp.broadcast_to(jnp.asarray(total_depth, i32), (B,))
    pd0 = (jnp.broadcast_to(jnp.asarray(root_ptr, u32), (B,)) & PTR_MASK) | (
        depth0.astype(u32) << DEPTH_SHIFT
    )

    state0 = (
        jnp.ones(B, bool), jnp.zeros(B, bool), jnp.zeros(B, bool),
        pd0, idx0, jnp.full(B, MAX_SCALE - 1, i32),
        posx0, posy0, posz0, t_min0, t_max0, t_max0,
        jnp.full(B, 0x00FFFFFF, u32),
        jnp.full(B, INVALID_PTR, u32),  # material_section_ptr
        jnp.full(B, INVALID_PTR, u32),  # pre_leaf_pointer
        jnp.zeros((H, B), u32), jnp.zeros((H, B), f32),
    )

    def cond(carry):
        it, s = carry
        return (it < max_steps) & jnp.any(s[0])

    def body(carry):
        it, s = carry
        for _ in range(unroll):
            s = step(s)
        return it + unroll, s

    steps_used, s = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))

    (active, hit, inside, pd, idx, scale, posx, posy, posz, t_min, t_max,
     h, adj_last, mat_ptr, pre_leaf, stack_pd, stack_tmax) = s

    leaf_value, face_id, ux, uy, dst, tex_lod, (upx, upy, upz) = hit_phase(
        pd, idx, scale, posx, posy, posz, t_min, mat_ptr, pre_leaf
    )
    scale_exp2 = _exp2_scale(scale)
    hx = jnp.clip(rox + t_min * rdx, upx + EPSILON, upx + scale_exp2 - EPSILON)
    hy = jnp.clip(roy + t_min * rdy, upy + EPSILON, upy + scale_exp2 - EPSILON)
    hz = jnp.clip(roz + t_min * rdz, upz + EPSILON, upz + scale_exp2 - EPSILON)
    hit_pos = (jnp.stack([hx, hy, hz], -1) - 1.0) / octree_scale

    return TraversalResult(
        t=jnp.where(hit, dst, -1.0).astype(f32),
        value=jnp.where(hit, leaf_value, 0).astype(u32),
        face_id=jnp.where(hit, face_id, 0).astype(i32),
        pos=jnp.where(hit[:, None], hit_pos, 0.0).astype(f32),
        uv=jnp.where(hit[:, None], jnp.stack([ux, uy], -1), 0.0).astype(f32),
        lod=jnp.where(hit, tex_lod, 0.0).astype(f32),
        inside_voxel=inside,
        steps=jnp.broadcast_to(steps_used, (B,)),
        trace=None,
    )
