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
import numpy as _np

from typing import NamedTuple

from .bits import EPSILON, MAX_SCALE, copysign_epsilon, f32_bits, find_msb, smoothstep
from .traversal import RayConsts, TraversalResult, _exp2_scale

MAX_STEPS = 1000
# NUMPY scalars, NOT jnp scalars: module-level jnp constants get hoisted
# into jaxpr argument slots whose compile-vs-dispatch bookkeeping miscounts
# on jax 0.9 ("Execution supplied N buffers but compiled program expected
# N+1" at the first post-compaction round); numpy scalars inline as literals.
INVALID_PTR = _np.uint32(0xFFFFFFFF)
# ptr | depth << 27 packing limits the CSVO byte buffer to 128 MiB
DEPTH_SHIFT = 27
PTR_MASK = _np.uint32((1 << DEPTH_SHIFT) - 1)
STACK_HEIGHT = 12


class _Readers:
    """Byte-stream readers over the CSVO u32 word buffer
    (reference: svo.csvo.glsl:25-133)."""

    def __init__(self, words):
        self.words = words
        self.nwords = words.shape[0]

    def word(self, i):
        i32 = jnp.int32
        return self.words[jnp.clip(i.astype(i32), 0, self.nwords - 1)]

    def read_u32(self, byte_ptr):
        u32 = jnp.uint32
        index = byte_ptr // 4
        mod = (byte_ptr % 4).astype(u32)
        lo = self.word(index)
        hi = self.word(index + 1)
        sh = mod * 8
        lo_part = jnp.where(mod == 0, lo, lo >> sh)
        hi_part = jnp.where(mod == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
        return (lo_part | hi_part).astype(u32)

    def read_u16(self, byte_ptr):
        return self.read_u32(byte_ptr) & jnp.uint32(0xFFFF)

    def read_byte(self, byte_ptr):
        u32 = jnp.uint32
        index = byte_ptr // 4
        mod = (byte_ptr % 4).astype(u32)
        return (self.word(index) >> (mod * 8)) & jnp.uint32(0xFF)

    @staticmethod
    def popcount(x):
        return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.uint32)

    @staticmethod
    def tag_bytes(header, upto):
        """Sum of pointer byte-widths for children with idx < upto
        ((1 << tag) >> 1 per 2-bit tag, reference: glsl:63-84)."""
        u32 = jnp.uint32
        total = jnp.zeros_like(header)
        for k in range(8):
            tag = (header >> jnp.uint32(2 * k)) & jnp.uint32(3)
            width = (jnp.uint32(1) << tag) >> jnp.uint32(1)
            total = total + jnp.where(k < upto, width, 0).astype(u32)
        return total

    def read_next_ptr(self, ptr, depth, idx):
        """Child pointer for node kind by depth; returns
        (next_ptr | INVALID, crossed_boundary). Reference: glsl:53-116."""
        u32, i32 = jnp.uint32, jnp.int32
        header16 = self.read_u16(ptr)
        tag = (header16 >> (idx * jnp.uint32(2))) & jnp.uint32(3)
        off_internal = self.tag_bytes(header16, idx)
        ptr_bytes = self.tag_bytes(header16, jnp.full_like(idx, 8))
        raw = self.read_u32(ptr + 2 + off_internal)
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

        header8 = self.read_byte(ptr)
        bit_set = (header8 >> idx) & jnp.uint32(1)
        rank = self.popcount(header8 & ((jnp.uint32(1) << idx) - 1))
        n_children = self.popcount(header8)

        pre_off = self.read_byte(ptr + 1 + rank)
        pre_ptr = ptr + 1 + n_children + pre_off
        leaf_ptr = ptr + 1 + 2 + rank

        byte_ptr_sel = jnp.where(depth == 3, pre_ptr, leaf_ptr)
        byte_valid = bit_set != 0

        nxt = jnp.where(depth > 3, internal_ptr, byte_ptr_sel).astype(u32)
        valid = jnp.where(depth > 3, internal_valid, byte_valid)
        crossed = crossed & (depth > 3)
        return jnp.where(valid, nxt, INVALID_PTR), crossed

    def read_leaf(self, mat_ptr, pre_leaf_ptr, ptr, idx):
        """Material for a leaf bit (reference: glsl:119-133)."""
        u32, i32 = jnp.uint32, jnp.int32
        mat_off = self.read_u16(pre_leaf_ptr + 1)
        leaf_index = (ptr - (pre_leaf_ptr + 3)).astype(i32)
        bit_mark = leaf_index * 8 + idx.astype(i32)
        m0 = jnp.where(
            bit_mark >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << jnp.clip(bit_mark, 0, 31).astype(u32)) - 1,
        )
        v0 = self.read_u32(pre_leaf_ptr + 3) & m0
        over = jnp.clip(bit_mark - 32, 0, 31)
        m1 = jnp.where(
            bit_mark - 32 >= 32,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << over.astype(u32)) - 1,
        )
        m1 = jnp.where(bit_mark - 32 <= 0, jnp.uint32(0), m1)
        v1 = self.read_u32(pre_leaf_ptr + 3 + 4) & m1
        preceding = self.popcount(v0) + self.popcount(v1)
        return self.read_u32(mat_ptr + mat_off * 4 + preceding * 4)


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

    if not (cast_translucent and alpha_fn is not None):
        # opaque: the fetch-on-PUSH engine — ADVANCE/POP are fetch-free,
        # so the (step-heavy, fetch-light) miss path runs at ESVO speed
        # instead of paying ~8 element gathers per step
        from .traversal import make_ray_consts

        c = make_ray_consts(octree_scale, ro, rd, max_dst)
        state = init_state_csvo(c, root_ptr, total_depth)
        iters, s = run_loop_csvo(words, c, state, max_steps, 3)
        return finalize_csvo(words, c, s, iters)

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


# ---------------------------------------------------------------------------
# Restartable deferred engine — the CSVO counterpart of traversal.py's
# push-driven PushState machinery, with the SAME pipeline-facing semantics:
# stop at every leaf (alpha judged by the host pipeline between rounds),
# restart-based compaction (the walk is memoryless given (ray, t_min) — the
# material-section and pre-leaf pointers are re-derived during re-descent),
# and the floor/suppress/missed bookkeeping for judged resumes. No
# fetch/substep split: CSVO reads are per-lane element gathers, so every
# step reads inline (~2 unaligned u32 reads; reference: svo.csvo.glsl).
# ---------------------------------------------------------------------------


class CsvoPushState(NamedTuple):
    active: jnp.ndarray
    hit: jnp.ndarray
    inside: jnp.ndarray
    pp: jnp.ndarray  # ptr | depth << DEPTH_SHIFT
    idx: jnp.ndarray
    scale: jnp.ndarray
    posx: jnp.ndarray
    posy: jnp.ndarray
    posz: jnp.ndarray
    t_min: jnp.ndarray
    t_max: jnp.ndarray
    h: jnp.ndarray
    adj_last: jnp.ndarray
    missed: jnp.ndarray
    suppress: jnp.ndarray
    stack_pp: jnp.ndarray  # (H, B) pd stack
    stack_tmax: jnp.ndarray
    mat_ptr: jnp.ndarray  # chunk material-section pointer
    pre_leaf: jnp.ndarray  # enclosing lnode pointer (depth-2 node)
    floor: jnp.ndarray
    # ---- fetch-on-PUSH node registers (round 3) -------------------------
    # The round-2 engine re-read the byte stream EVERY step (~8 element
    # gathers: header16, raw pointer word x2, header8, pre_off, blob); on
    # this hardware that cost ~48 ns/lane/step and made the CSVO miss path
    # 23x slower than ESVO's (docs/shader_microbench.json). Like the ESVO
    # push engine, all decode bytes now live in registers: ``win`` caches
    # a 48-byte window (every decode read checks CONTAINMENT in it —
    # [win_base*4, win_base*4+48) — not node ownership), ``hdr`` the
    # current node's first two bytes (the child-existence masks), and
    # POP restores ``hdr`` from a stack plane. Memory is touched only in
    # ``fetch_phase_csvo`` — one row gather over an 8-word-strided
    # overlapping view — on a PUSH whose target bytes fall outside the
    # window (and once per chunk-boundary crossing, resolved via the
    # ``crossing`` flag in a later substep). Containment is what makes
    # the bottom-level skim fetch-free: a depth-2 lnode subtree (mask +
    # u16 + up to 8 leaf masks ≈ 11 contiguous bytes) fits entirely in
    # one window, so leaf pushes, pops back, and sibling re-pushes all
    # run on registers — the CSVO analogue of the ESVO engine's
    # occupancy registers (traversal.PushState c0..c3).
    hdr: jnp.ndarray        # (B,) u32: node's first 2 bytes (masks)
    need_fetch: jnp.ndarray  # (B,) bool: win/hdr stale (pending push)
    crossing: jnp.ndarray   # (B,) bool: pp points at a chunk blob header
    win: jnp.ndarray        # (12, B) u32: words [win_base, win_base+12)
    win_base: jnp.ndarray   # (B,) i32 word index of win[0]
    stack_hdr: jnp.ndarray  # (H, B) u32
    # pending stack write (deferred flush, see traversal.PushState): pushes
    # buffer (slot, pp, t_max, hdr) here; fetch_phase_csvo flushes once per
    # iteration instead of three (H, B) rewrites per substep. POP reads
    # consult the pending slot. A push that wants to STORE while the
    # pending register holds a different slot rides the existing ``defer``
    # path (refetch + retry after the flush — value-identical refetch).
    pend_slot: jnp.ndarray  # (B,) i32, -1 = empty
    pend_pp: jnp.ndarray    # (B,) u32
    pend_tmax: jnp.ndarray  # (B,) f32
    pend_hdr: jnp.ndarray   # (B,) u32


WIN_WORDS = 12      # 48-byte node window: covers header16 + the widest
                    # pointer read (2 + 7*4 + 4 = 34 bytes) at any ptr%4
OVERLAP_STRIDE = 8  # overlapping-row stride (words)
OVERLAP_WIDTH = 24  # row width: stride + 4 (ptr>>2 alignment) + WIN_WORDS


def make_overlap_rows(words):
    """(ceil(N/8)+2, 24) u32 view where row k = words[8k : 8k+24]: any
    word-aligned 12-word window is extractable from ONE row (nodes are
    byte-aligned, so unlike ESVO's 12-word blocks they cannot be fetched
    from a disjoint reshape). Built from three shifted reshapes — no
    gather."""
    n = words.shape[0]
    rows = -(-n // OVERLAP_STRIDE) + 2
    pad = rows * OVERLAP_STRIDE - n + 2 * OVERLAP_STRIDE
    base = jnp.pad(words, (0, pad)).reshape(-1, OVERLAP_STRIDE)
    return jnp.concatenate([base[:rows], base[1 : rows + 1],
                            base[2 : rows + 2]], axis=1)


def _sel_win(win, word_off):
    """win (12, B), word_off (B,) -> (B,) selected word (0 if out of
    range)."""
    lv = jnp.arange(WIN_WORDS, dtype=jnp.int32)[:, None] == word_off[None, :]
    return jnp.where(lv, win, jnp.uint32(0)).sum(axis=0).astype(jnp.uint32)


def _win_u32(win, win_base, byte_ptr):
    """Unaligned 4-byte read served from the window registers
    (bit-identical to _Readers.read_u32 for in-window reads)."""
    u32, i32 = jnp.uint32, jnp.int32
    b = byte_ptr.astype(i32) - win_base * 4
    word_off = b >> 2
    mod = (b & 3).astype(u32)
    lo = _sel_win(win, word_off)
    hi = _sel_win(win, word_off + 1)
    sh = mod * 8
    lo_part = jnp.where(mod == 0, lo, lo >> sh)
    hi_part = jnp.where(mod == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
    return (lo_part | hi_part).astype(u32)


def _win_byte(win, win_base, byte_ptr):
    u32, i32 = jnp.uint32, jnp.int32
    b = byte_ptr.astype(i32) - win_base * 4
    mod = (b & 3).astype(u32)
    return (_sel_win(win, b >> 2) >> (mod * 8)) & jnp.uint32(0xFF)


def _tag_bytes_reg(header, upto):
    """tag_bytes on register values (see _Readers.tag_bytes)."""
    u32 = jnp.uint32
    total = jnp.zeros_like(header)
    for k in range(8):
        tag = (header >> jnp.uint32(2 * k)) & jnp.uint32(3)
        width = (jnp.uint32(1) << tag) >> jnp.uint32(1)
        total = total + jnp.where(k < upto, width, 0).astype(u32)
    return total


def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.uint32)


def _csvo_entry(c: RayConsts, t_floor=None):
    """Cube entry state (identical geometry to the ESVO kernel)."""
    f32, i32 = jnp.float32, jnp.int32
    t_min = jnp.maximum(
        jnp.maximum(2.0 * c.tcx - c.tbx, 2.0 * c.tcy - c.tby),
        2.0 * c.tcz - c.tbz,
    )
    t_min = jnp.maximum(0.0, t_min)
    if t_floor is not None:
        t_min = jnp.maximum(t_min, t_floor)
    t_max = jnp.minimum(
        jnp.minimum(c.tcx - c.tbx, c.tcy - c.tby), c.tcz - c.tbz
    )
    in_x = t_min < 1.5 * c.tcx - c.tbx
    in_y = t_min < 1.5 * c.tcy - c.tby
    in_z = t_min < 1.5 * c.tcz - c.tbz
    idx = in_x.astype(i32) | (in_y.astype(i32) << 1) | (in_z.astype(i32) << 2)
    posx = jnp.where(in_x, 1.5, 1.0).astype(f32)
    posy = jnp.where(in_y, 1.5, 1.0).astype(f32)
    posz = jnp.where(in_z, 1.5, 1.0).astype(f32)
    return t_min, t_max, idx, posx, posy, posz


def _csvo_root(B, root_ptr, total_depth):
    u32, i32 = jnp.uint32, jnp.int32
    depth0 = jnp.broadcast_to(jnp.asarray(total_depth, i32), (B,))
    return (jnp.broadcast_to(jnp.asarray(root_ptr, u32), (B,)) & PTR_MASK) | (
        depth0.astype(u32) << DEPTH_SHIFT
    )


def _fresh_regs(B, H):
    u32, i32 = jnp.uint32, jnp.int32
    return dict(
        hdr=jnp.zeros(B, u32),
        need_fetch=jnp.ones(B, bool),  # first fetch loads the root window
        crossing=jnp.zeros(B, bool),
        win=jnp.zeros((WIN_WORDS, B), u32),
        # far negative: containment tests fail until the first fetch
        # (b = ptr - win_base*4 stays ≥ 0 and > 48 for any u28 ptr)
        win_base=jnp.full(B, -(1 << 28), i32),
        stack_hdr=jnp.zeros((H, B), u32),
        pend_slot=jnp.full(B, -1, i32),
        pend_pp=jnp.zeros(B, u32),
        pend_tmax=jnp.zeros(B, jnp.float32),
        pend_hdr=jnp.zeros(B, u32),
    )


def init_state_csvo(c: RayConsts, root_ptr, total_depth,
                    stack_height: int = STACK_HEIGHT) -> CsvoPushState:
    B = c.rox.shape[0]
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    H = stack_height
    t_min, t_max, idx, posx, posy, posz = _csvo_entry(c)
    return CsvoPushState(
        active=jnp.ones(B, bool),
        hit=jnp.zeros(B, bool),
        inside=jnp.zeros(B, bool),
        pp=_csvo_root(B, root_ptr, total_depth),
        idx=idx, scale=jnp.full(B, MAX_SCALE - 1, i32),
        posx=posx, posy=posy, posz=posz,
        t_min=t_min, t_max=t_max, h=t_max,
        adj_last=jnp.full(B, 0x00FFFFFF, u32),
        missed=jnp.zeros(B, bool),
        suppress=jnp.zeros(B, bool),
        stack_pp=jnp.zeros((H, B), u32),
        stack_tmax=jnp.zeros((H, B), f32),
        mat_ptr=jnp.full(B, INVALID_PTR, u32),
        pre_leaf=jnp.full(B, INVALID_PTR, u32),
        floor=jnp.full(B, -1.0, f32),
        **_fresh_regs(B, H),
    )


def restart_state_csvo(c: RayConsts, t_floor, inside, adj_last, missed,
                       suppress, root_ptr, total_depth,
                       stack_height: int = STACK_HEIGHT) -> CsvoPushState:
    """Resume a ray mid-flight by re-descending from the root with its old
    t_min as the entry floor (see traversal.restart_state_push). The
    material-section / pre-leaf pointers re-derive during the descent."""
    B = c.rox.shape[0]
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    H = stack_height
    t_min, t_max, idx, posx, posy, posz = _csvo_entry(c, t_floor)
    return CsvoPushState(
        active=jnp.ones(B, bool) & (t_min <= t_max),
        hit=jnp.zeros(B, bool),
        inside=inside,
        pp=_csvo_root(B, root_ptr, total_depth),
        idx=idx, scale=jnp.full(B, MAX_SCALE - 1, i32),
        posx=posx, posy=posy, posz=posz,
        t_min=t_min, t_max=t_max, h=t_max,
        adj_last=adj_last,
        missed=missed,
        suppress=suppress,
        stack_pp=jnp.zeros((H, B), u32),
        stack_tmax=jnp.zeros((H, B), f32),
        mat_ptr=jnp.full(B, INVALID_PTR, u32),
        pre_leaf=jnp.full(B, INVALID_PTR, u32),
        floor=t_min,
        **_fresh_regs(B, H),
    )


def fetch_phase_csvo(table, s: CsvoPushState) -> CsvoPushState:
    """Serve pending fetches: ONE row gather over the overlapping view
    loads the 48-byte window (and its header) for every lane whose window
    is stale; other lanes keep their registers."""
    u32, i32 = jnp.uint32, jnp.int32
    # flush the buffered stack write (one one-hot rewrite per stack per
    # iteration)
    H = s.stack_pp.shape[0]
    have = s.pend_slot >= 0
    lv = jnp.arange(H, dtype=i32)[:, None] == s.pend_slot[None, :]
    do_store = have[None, :] & lv
    s = s._replace(
        stack_pp=jnp.where(do_store, s.pend_pp[None, :], s.stack_pp),
        stack_tmax=jnp.where(do_store, s.pend_tmax[None, :], s.stack_tmax),
        stack_hdr=jnp.where(do_store, s.pend_hdr[None, :], s.stack_hdr),
        pend_slot=jnp.full_like(s.pend_slot, -1),
    )
    ptr = s.pp & PTR_MASK
    w0 = (ptr >> 2).astype(i32)
    k = w0 >> 3
    row = table[jnp.clip(k, 0, table.shape[0] - 1)]  # (B, 24) row gather
    off = w0 - (k << 3)  # 0..7
    iota = jnp.arange(OVERLAP_WIDTH, dtype=i32)[None, :]
    win_new = jnp.stack([
        jnp.where(iota == (off + j)[:, None], row, jnp.uint32(0))
        .sum(axis=1).astype(u32)
        for j in range(WIN_WORDS)
    ])
    hdr_new = _win_u32(win_new, w0, ptr) & jnp.uint32(0xFFFF)
    take = s.need_fetch
    return s._replace(
        win=jnp.where(take[None, :], win_new, s.win),
        win_base=jnp.where(take, w0, s.win_base),
        hdr=jnp.where(take, hdr_new, s.hdr),
        need_fetch=jnp.zeros_like(s.need_fetch),
    )


def substep_csvo(c: RayConsts, s: CsvoPushState) -> CsvoPushState:
    """One fetch-free deferred CSVO step (stop at every leaf; floor-gated
    adjacency and suppress expiry exactly as in traversal.substep). Lanes
    awaiting a fetch stall; chunk-boundary crossings resolve here from the
    fetched blob header; a push whose node window was evicted (post-POP
    sibling descent) re-requests it and retries."""
    B = s.active.shape[0]
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    H = s.stack_pp.shape[0]
    stack_base = MAX_SCALE - H

    ptr = s.pp & PTR_MASK
    depth = (s.pp >> DEPTH_SHIFT).astype(i32)
    scale_exp2 = _exp2_scale(s.scale)
    adj_count = (s.adj_last >> 24).astype(i32)
    last_value = s.adj_last & jnp.uint32(0x00FFFFFF)

    stall = s.need_fetch
    awake = s.active & ~stall
    overrun = awake & (c.max_dst >= 0) & (s.t_min > c.max_dst)
    active = s.active & ~overrun
    awake = awake & ~overrun

    # ---- chunk-boundary crossing resolution (blob window present) ------
    resolve = awake & s.crossing
    blob_lod = _win_byte(s.win, s.win_base, ptr)
    blob_mat_bytes = _win_u32(s.win, s.win_base, ptr + 1)
    res_ptr = ptr + 5 + blob_mat_bytes
    res_pp = (res_ptr & PTR_MASK) | (blob_lod << jnp.uint32(DEPTH_SHIFT))

    act = awake & ~s.crossing

    tcox = s.posx * c.tcx - c.tbx
    tcoy = s.posy * c.tcy - c.tby
    tcoz = s.posz * c.tcz - c.tbz
    tc_max = jnp.minimum(jnp.minimum(tcox, tcoy), tcoz)

    # ---- child existence from the header registers ---------------------
    octant_idx = (s.idx ^ c.octant_mask).astype(u32)
    header16 = s.hdr
    tag = (header16 >> (octant_idx * jnp.uint32(2))) & jnp.uint32(3)
    header8 = header16 & jnp.uint32(0xFF)
    bit_set = (header8 >> octant_idx) & jnp.uint32(1)
    is_child = jnp.where(depth > 3, tag != 0, bit_set != 0)
    is_leaf = is_child & (depth < 2)

    pre_leaf = jnp.where(act & (depth == 2), ptr, s.pre_leaf)

    hit_branch = is_child & (s.t_min <= s.t_max)
    inside = s.inside | (act & hit_branch & is_leaf & (s.t_min == 0))

    leaf_hit = act & hit_branch & is_leaf & (s.t_min > 0)
    sup_active = s.suppress & (s.t_min <= s.floor)
    accept = leaf_hit & ~sup_active
    suppress = jnp.where(act, s.suppress & ~leaf_hit & (s.t_min <= s.floor),
                         s.suppress)

    miss = act & ~hit_branch & (s.t_min > s.floor)
    adj_count = jnp.where(miss, 0, adj_count)
    last_value = jnp.where(miss, jnp.uint32(0x00FFFFFF), last_value)
    adj_last = (adj_count.astype(u32) << 24) | last_value
    missed = s.missed | miss

    hit = s.hit | accept
    active = active & ~accept

    # ---- PUSH (pointer decode from the window registers) ---------------
    half_scale = scale_exp2 * 0.5
    t_center_x = half_scale * c.tcx + tcox
    t_center_y = half_scale * c.tcy + tcoy
    t_center_z = half_scale * c.tcz + tcoz
    tv_max = jnp.minimum(s.t_max, tc_max)
    want_push = (
        act & hit_branch & ~(is_leaf & (s.t_min > 0)) & (s.t_min <= tv_max)
    )

    # window containment: a read of ``need`` bytes at byte ptr ``p`` can be
    # served from the register window iff it lies inside
    # [win_base*4, win_base*4 + 48). hdr is always the CURRENT node's (set
    # by fetch / covered push / stack POP), so the offsets below are valid
    # whenever the bytes are.
    win_lo = s.win_base * 4

    def _covered(p, need):
        b = p.astype(i32) - win_lo
        return (b >= 0) & (b + need <= WIN_WORDS * 4)

    off_internal = _tag_bytes_reg(header16, octant_idx)
    ptr_bytes = _tag_bytes_reg(header16, jnp.full_like(octant_idx, 8))
    dec_ok = jnp.where(
        depth > 3,
        _covered(ptr + 2 + off_internal, 4),
        jnp.where(depth == 3, _covered(ptr + 1, 8), True),
    )
    # a push that wants to STORE needs the pending register free (or
    # holding the same slot); otherwise it defers. Only decode-coverage
    # defers (~dec_ok) refetch the window; a pend-busy-only defer keeps
    # its VALID window and just spins until the next fetch phase flushes
    # the pending register (mirrors the ESVO engine's spin — no redundant
    # value-identical row gather for the lane).
    slot = s.scale - stack_base
    store_wanted = tc_max < s.h
    pend_ok = (s.pend_slot < 0) | (s.pend_slot == slot)
    push_ok = dec_ok & (pend_ok | ~store_wanted)
    can_push = want_push & push_ok
    defer_refetch = want_push & ~dec_ok  # window lacks the decode bytes

    raw = _win_u32(s.win, s.win_base, ptr + 2 + off_internal)
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
    rank = _popcount(header8 & ((jnp.uint32(1) << octant_idx) - 1))
    n_children = _popcount(header8)
    pre_off = _win_byte(s.win, s.win_base, ptr + 1 + rank)
    pre_ptr = ptr + 1 + n_children + pre_off
    leaf_ptr = ptr + 1 + 2 + rank
    next_ptr = jnp.where(depth > 3, internal_ptr,
                         jnp.where(depth == 3, pre_ptr, leaf_ptr)).astype(u32)
    crossed = crossed & (depth > 3)

    # fetch-free push: when the child's header bytes are already inside
    # the window, its hdr is a register read and no fetch is needed (the
    # child's own decode reads re-check containment when they happen)
    child_cov = _covered(next_ptr, 2) & ~crossed
    hdr_child = _win_u32(s.win, s.win_base, next_ptr) & jnp.uint32(0xFFFF)

    store = can_push & store_wanted
    pend_slot = jnp.where(store, slot, s.pend_slot)
    pend_pp = jnp.where(store, s.pp, s.pend_pp)
    pend_tmax = jnp.where(store, s.t_max, s.pend_tmax)
    pend_hdr = jnp.where(store, s.hdr, s.pend_hdr)
    h_new = jnp.where(can_push, tc_max, s.h)

    # crossed pushes park at the blob header (depth bits unused until the
    # crossing resolves); uncrossed pushes enter the child directly
    push_pp = jnp.where(
        crossed, next_ptr & PTR_MASK,
        (next_ptr & PTR_MASK) | ((depth - 1).astype(u32) << DEPTH_SHIFT),
    )
    push_scale = s.scale - 1

    pin_x = s.t_min < t_center_x
    pin_y = s.t_min < t_center_y
    pin_z = s.t_min < t_center_z
    push_idx = pin_x.astype(i32) | (pin_y.astype(i32) << 1) | (pin_z.astype(i32) << 2)
    push_posx = s.posx + jnp.where(pin_x, half_scale, 0.0)
    push_posy = s.posy + jnp.where(pin_y, half_scale, 0.0)
    push_posz = s.posz + jnp.where(pin_z, half_scale, 0.0)

    # ---- ADVANCE --------------------------------------------------------
    # accepted lanes freeze where they stand (the deferred pipeline reads
    # their state verbatim); suppressed re-visits still advance past
    advance = act & ~want_push & ~accept
    step_x = tc_max >= tcox
    step_y = tc_max >= tcoy
    step_z = tc_max >= tcoz
    step_mask = step_x.astype(i32) | (step_y.astype(i32) << 1) | (step_z.astype(i32) << 2)
    adv_posx = s.posx - jnp.where(step_x, scale_exp2, 0.0)
    adv_posy = s.posy - jnp.where(step_y, scale_exp2, 0.0)
    adv_posz = s.posz - jnp.where(step_z, scale_exp2, 0.0)
    adv_idx = s.idx ^ step_mask

    # ---- POP -------------------------------------------------------------
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
    pop_pp = jnp.where(pop_lv, s.stack_pp, 0).sum(axis=0).astype(u32)
    pop_t_max = jnp.where(pop_lv, s.stack_tmax, 0.0).sum(axis=0)
    pop_hdr = jnp.where(pop_lv, s.stack_hdr, 0).sum(axis=0).astype(u32)
    # reads-after-buffered-writes: the pending slot shadows the stack
    pop_hit = s.pend_slot == pop_slot
    pop_pp = jnp.where(pop_hit, s.pend_pp, pop_pp)
    pop_t_max = jnp.where(pop_hit, s.pend_tmax, pop_t_max)
    pop_hdr = jnp.where(pop_hit, s.pend_hdr, pop_hdr)

    sc = jnp.clip(pop_scale, 0, MAX_SCALE).astype(u32)
    shx = f32_bits(adv_posx) >> sc
    shy = f32_bits(adv_posy) >> sc
    shz = f32_bits(adv_posz) >> sc
    pop_posx = jax.lax.bitcast_convert_type(shx << sc, f32)
    pop_posy = jax.lax.bitcast_convert_type(shy << sc, f32)
    pop_posz = jax.lax.bitcast_convert_type(shz << sc, f32)
    pop_idx = ((shx & 1) | ((shy & 1) << 1) | ((shz & 1) << 2)).astype(i32)

    def sel(push_v, pop_v, adv_v, old_v):
        v = jnp.where(can_push, push_v, old_v)
        v = jnp.where(advance, adv_v, v)
        v = jnp.where(do_pop, pop_v, v)
        return v

    pp_next = sel(push_pp, pop_pp, s.pp, s.pp)
    pp_next = jnp.where(resolve, res_pp, pp_next)

    return CsvoPushState(
        active=active,
        hit=hit,
        inside=inside,
        pp=pp_next,
        idx=sel(push_idx, pop_idx, adv_idx, s.idx),
        scale=sel(push_scale, pop_scale, s.scale, s.scale),
        posx=sel(push_posx, pop_posx, adv_posx, s.posx),
        posy=sel(push_posy, pop_posy, adv_posy, s.posy),
        posz=sel(push_posz, pop_posz, adv_posz, s.posz),
        t_min=jnp.where(advance, tc_max, s.t_min),
        t_max=sel(tv_max, pop_t_max, s.t_max, s.t_max),
        h=jnp.where(do_pop, 0.0, h_new),
        adj_last=adj_last,
        missed=missed,
        suppress=suppress,
        stack_pp=s.stack_pp,
        stack_tmax=s.stack_tmax,
        mat_ptr=jnp.where(resolve, ptr + 5, s.mat_ptr),
        pre_leaf=pre_leaf,
        floor=s.floor,
        hdr=jnp.where(do_pop, pop_hdr,
                      jnp.where(can_push & child_cov, hdr_child, s.hdr)),
        need_fetch=s.need_fetch | (can_push & ~child_cov) | defer_refetch
        | resolve,
        crossing=(s.crossing & ~resolve) | (can_push & crossed),
        win=s.win,
        win_base=s.win_base,
        stack_hdr=s.stack_hdr,
        pend_slot=pend_slot,
        pend_pp=pend_pp,
        pend_tmax=pend_tmax,
        pend_hdr=pend_hdr,
    )


def run_loop_csvo(words, c: RayConsts, state: CsvoPushState, max_iters: int,
                  substeps: int) -> tuple[jnp.ndarray, CsvoPushState]:
    """Iterate fetch phase + ``substeps`` fetch-free CSVO steps per
    while-iteration until all rays retire (interface-compatible with
    traversal.run_loop_push)."""
    table = make_overlap_rows(words)

    def cond(carry):
        it, s = carry
        return (it < max_iters) & jnp.any(s.active)

    def body(carry):
        it, s = carry
        s = fetch_phase_csvo(table, s)
        for _ in range(substeps):
            s = substep_csvo(c, s)
        return it + 1, s

    return jax.lax.while_loop(cond, body, (jnp.int32(0), state))


def hit_phase_csvo(words, c: RayConsts, pp, idx, scale, posx, posy, posz,
                   t_min, mat_ptr, pre_leaf, value_override=None):
    """Hit record (value, face, uv, lod, up) from frozen per-lane state —
    the CSVO counterpart of traversal.hit_phase_fat. ``value_override``:
    carried leaf values (adaptive pipeline) — skips the byte-stream
    material resolve entirely."""
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    octant_idx = (idx ^ c.octant_mask).astype(u32)
    scale_exp2 = _exp2_scale(scale)
    if value_override is not None:
        leaf_value = value_override
    else:
        R = _Readers(words)
        ptr = pp & PTR_MASK
        leaf_value = R.read_leaf(mat_ptr, pre_leaf, ptr, octant_idx)

    t2x = (posx + scale_exp2) * c.tcx - c.tbx
    t2y = (posy + scale_exp2) * c.tcy - c.tby
    t2z = (posz + scale_exp2) * c.tcz - c.tbz
    tc_min = jnp.maximum(jnp.maximum(t2x, t2y), t2z)
    upx = jnp.where(c.mirror_x, 3.0 - scale_exp2 - posx, posx)
    upy = jnp.where(c.mirror_y, 3.0 - scale_exp2 - posy, posy)
    upz = jnp.where(c.mirror_z, 3.0 - scale_exp2 - posz, posz)
    sign_x = (f32_bits(c.rdx) >> jnp.uint32(31)).astype(i32)
    sign_y = (f32_bits(c.rdy) >> jnp.uint32(31)).astype(i32)
    sign_z = (f32_bits(c.rdz) >> jnp.uint32(31)).astype(i32)
    on_x = tc_min == t2x
    on_y = (~on_x) & (tc_min == t2y)
    face_id = jnp.where(on_x, sign_x, jnp.where(on_y, 2 | sign_y, 4 | sign_z))
    ux = jnp.where(
        on_x, (c.roz + c.rdz * t2x) - upz,
        jnp.where(on_y, (c.rox + c.rdx * t2y) - upx, (c.rox + c.rdx * t2z) - upx),
    )
    uy = jnp.where(
        on_x, (c.roy + c.rdy * t2x) - upy,
        jnp.where(on_y, (c.roz + c.rdz * t2y) - upz, (c.roy + c.rdy * t2z) - upy),
    )
    ux = ux / scale_exp2
    uy = uy / scale_exp2
    ux = jnp.where(on_x & c.mirror_x, 1.0 - ux, ux)
    uy = jnp.where(on_y & c.mirror_y, 1.0 - uy, uy)
    ux = jnp.where(~on_x & ~on_y & ~c.mirror_z, 1.0 - ux, ux)
    dst = t_min / c.octree_scale
    tex_lod = smoothstep(15.0, 25.0, dst) * (dst - 15.0) * 0.05
    return leaf_value, face_id, ux, uy, dst, tex_lod, (upx, upy, upz)


def finalize_csvo(words, c: RayConsts, s: CsvoPushState,
                  steps_used, value_override=None) -> TraversalResult:
    """Assemble the TraversalResult from final (or frozen-shell) state."""
    f32, u32 = jnp.float32, jnp.uint32
    B = s.t_min.shape[0]
    leaf_value, face_id, ux, uy, dst, tex_lod, (upx, upy, upz) = hit_phase_csvo(
        words, c, s.pp, s.idx, s.scale, s.posx, s.posy, s.posz, s.t_min,
        s.mat_ptr, s.pre_leaf, value_override=value_override,
    )
    scale_exp2 = _exp2_scale(s.scale)
    hx = jnp.clip(c.rox + s.t_min * c.rdx, upx + EPSILON, upx + scale_exp2 - EPSILON)
    hy = jnp.clip(c.roy + s.t_min * c.rdy, upy + EPSILON, upy + scale_exp2 - EPSILON)
    hz = jnp.clip(c.roz + s.t_min * c.rdz, upz + EPSILON, upz + scale_exp2 - EPSILON)
    hit_pos = (jnp.stack([hx, hy, hz], -1) - 1.0) / c.octree_scale
    hit = s.hit
    return TraversalResult(
        t=jnp.where(hit, dst, -1.0).astype(f32),
        value=jnp.where(hit, leaf_value, 0).astype(u32),
        face_id=jnp.where(hit, face_id, 0).astype(jnp.int32),
        pos=jnp.where(hit[:, None], hit_pos, 0.0).astype(f32),
        uv=jnp.where(hit[:, None], jnp.stack([ux, uy], -1), 0.0).astype(f32),
        lod=jnp.where(hit, tex_lod, 0.0).astype(f32),
        inside_voxel=s.inside,
        steps=jnp.broadcast_to(steps_used, (B,)),
        trace=None,
    )
