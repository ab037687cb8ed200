"""Batched ESVO ray traversal — the core device kernel.

A functional, lane-masked port of the Laine–Karras sparse-voxel-octree
raytracer (reference: assets/shaders/svo.esvo.glsl:50-393, after
"Efficient Sparse Voxel Octrees", Laine & Karras 2010). One GLSL thread per
pixel becomes a ``(B,)`` ray batch stepped together inside a
``lax.while_loop``; rays retire by masking. All float bit tricks (mantissa
PUSH/ADVANCE/POP, findMSB multi-level ascent, signed-epsilon substitution)
are preserved exactly via bitcasts.

TPU-shaped state design (each choice measured on v5e):
- Per-ray stacks are ``(H, B)`` arrays updated with one-hot masked selects —
  500x faster than scatter/`at[]` updates on TPU; ptr and parent-idx pack
  into one u32 per level.
- The loop carries NO result arrays: a ray's state freezes when it retires
  (accepted hit / exit / max-dst), and the full hit record (value, face, uv,
  position, lod) is recomputed from the frozen state in one vectorized pass
  after the loop.
- The body is unrolled ``unroll`` steps per loop iteration to amortize
  per-iteration dispatch overhead.

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
    f32_bits,
    find_msb,
    smoothstep,
)

MAX_STEPS = 1000
RELATIVE_BIT = jnp.uint32(1 << 31)
# ptr | parent_idx << 28 packing limits the SVO buffer to 2^28 u32 = 1 GiB
PTR_BITS = 28
PTR_MASK = jnp.uint32((1 << PTR_BITS) - 1)
STACK_HEIGHT = 12  # supports world depth ≤ 12 (radius 64 chunks)


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
    steps: jnp.ndarray  # (B,) int32 loop iterations used (diagnostics)
    trace: Optional[dict] = None  # step trace when recording (tests)


def _exp2_scale(scale):
    """Exact 2^(scale - MAX_SCALE) via exponent-bit construction."""
    return jax.lax.bitcast_convert_type(
        ((scale - MAX_SCALE + 127) << 23).astype(jnp.int32), jnp.float32
    )


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
    unroll: int = 4,
    row_pad: int = 12,
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
      unroll: static — traversal steps per loop iteration.
    """
    B = ro.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32
    u32 = jnp.uint32
    H = STACK_HEIGHT
    stack_base = MAX_SCALE - H  # stack slot = scale - stack_base

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
    t_min0 = jnp.maximum(
        jnp.maximum(2.0 * tcx - tbx, 2.0 * tcy - tby), 2.0 * tcz - tbz
    )
    t_min0 = jnp.maximum(0.0, t_min0)
    t_max0 = jnp.minimum(jnp.minimum(tcx - tbx, tcy - tby), tcz - tbz)

    in_x = t_min0 < 1.5 * tcx - tbx
    in_y = t_min0 < 1.5 * tcy - tby
    in_z = t_min0 < 1.5 * tcz - tbz
    idx0 = in_x.astype(i32) | (in_y.astype(i32) << 1) | (in_z.astype(i32) << 2)

    # Every block (preamble included) is one 12-u32 row: a single row gather
    # per step fetches the whole octant (header words 0..3 + body 4..11),
    # replacing 2-4 element gathers — gathers dominate traversal cost.
    nbuf = descriptors.shape[0]
    n_rows = nbuf // 12
    rows = descriptors[: n_rows * 12].reshape(n_rows, 12)
    if row_pad > 12:
        rows = jnp.pad(rows, ((0, 0), (0, row_pad - 12)))
    _word_iota = jnp.arange(rows.shape[1], dtype=i32)[None, :]

    def gather_row(ptr):
        r = jnp.clip((ptr // 12).astype(i32), 0, n_rows - 1)
        return rows[r]  # (B, row_pad)

    def row_word(row, widx):
        """Select word ``widx`` (B,) from each row (B, 12)."""
        return (
            jnp.where(_word_iota == widx[:, None], row, jnp.uint32(0))
            .sum(axis=1)
            .astype(u32)
        )

    def resolve_ptr(raw, ptr, pidx):
        """Resolve relative/absolute child pointer (svo.esvo.glsl:9-16)."""
        rel = ptr + 4 + pidx + (raw & jnp.uint32(0x7FFFFFFF))
        return jnp.where((raw & RELATIVE_BIT) != 0, rel, raw).astype(u32)

    def hit_phase(pp, idx, scale, posx, posy, posz, t_min, row=None):
        """Candidate leaf-hit data, recomputable from (frozen) state.
        Returns (leaf_value, face_id, ux, uy, dst, tex_lod, upos)."""
        ptr = pp & PTR_MASK
        pidx = (pp >> PTR_BITS).astype(i32)
        octant_idx = (idx ^ octant_mask).astype(u32)
        scale_exp2 = _exp2_scale(scale)

        if row is None:
            row = gather_row(ptr)
        raw = row_word(row, 4 + pidx)
        next_ptr = resolve_ptr(raw, ptr, pidx.astype(u32))
        child_row = gather_row(next_ptr)
        leaf_value = row_word(child_row, 4 + octant_idx.astype(i32))

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
        return leaf_value, face_id, ux, uy, dst, tex_lod, (upx, upy, upz)

    # stash ray constants for the trace-recording path
    hit_phase.octant_mask = octant_mask
    hit_phase.ro_s = (rox, roy, roz)
    hit_phase.rd_s = (rdx, rdy, rdz)

    def step(s):
        (active, hit, inside, pp, idx, scale, posx, posy, posz, t_min, t_max,
         h, adj_last, stack_pp, stack_tmax) = s

        ptr = pp & PTR_MASK
        pidx = (pp >> PTR_BITS).astype(i32)
        scale_exp2 = _exp2_scale(scale)
        adj_count = (adj_last >> 24).astype(i32)
        last_value = adj_last & jnp.uint32(0x00FFFFFF)

        # distance-limit early out (glsl:153-156)
        active = active & ~((max_dst >= 0) & (t_min > max_dst))

        tcox = posx * tcx - tbx
        tcoy = posy * tcy - tby
        tcoz = posz * tcz - tbz
        tc_max = jnp.minimum(jnp.minimum(tcox, tcoy), tcoz)

        octant_idx = (idx ^ octant_mask).astype(u32)
        bit = (jnp.uint32(1) << octant_idx).astype(u32)

        row = gather_row(ptr)  # the step's single block fetch
        descriptor = row_word(row, pidx // 2)
        descriptor = jnp.where(pidx % 2 != 0, descriptor >> jnp.uint32(16), descriptor)
        is_child = (descriptor & (bit << jnp.uint32(8))) != 0
        is_leaf = (descriptor & bit) != 0

        hit_branch = is_child & (t_min <= t_max)
        inside = inside | (active & hit_branch & is_leaf & (t_min == 0))

        # ---- HIT: leaf with positive travel (glsl:185-265) -----------------
        leaf_hit = hit_branch & is_leaf & (t_min > 0)

        if cast_translucent and alpha_fn is not None:
            leaf_value, face_id, ux, uy, _, tex_lod, _ = hit_phase(
                pp, idx, scale, posx, posy, posz, t_min, row=row
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

        # ---- PUSH (glsl:266-311) ---------------------------------------------
        half_scale = scale_exp2 * 0.5
        t_center_x = half_scale * tcx + tcox
        t_center_y = half_scale * tcy + tcoy
        t_center_z = half_scale * tcz + tcoz
        tv_max = jnp.minimum(t_max, tc_max)

        want_push = active & hit_branch & ~(is_leaf & (t_min > 0)) & (t_min <= tv_max)

        slot = scale - stack_base
        lv = jnp.arange(H, dtype=i32)[:, None] == slot[None, :]
        do_store = (want_push & (tc_max < h))[None, :] & lv
        stack_pp = jnp.where(do_store, pp[None, :], stack_pp)
        stack_tmax = jnp.where(do_store, t_max[None, :], stack_tmax)
        h_new = jnp.where(want_push, tc_max, h)

        next_ptr = resolve_ptr(row_word(row, 4 + pidx), ptr, pidx.astype(u32))
        push_pp = (next_ptr & PTR_MASK) | (octant_idx << PTR_BITS)
        push_scale = scale - 1

        pin_x = t_min < t_center_x
        pin_y = t_min < t_center_y
        pin_z = t_min < t_center_z
        push_idx = pin_x.astype(i32) | (pin_y.astype(i32) << 1) | (pin_z.astype(i32) << 2)
        push_posx = posx + jnp.where(pin_x, half_scale, 0.0)
        push_posy = posy + jnp.where(pin_y, half_scale, 0.0)
        push_posz = posz + jnp.where(pin_z, half_scale, 0.0)

        # ---- ADVANCE (glsl:319-331) ---------------------------------------------
        advance = active & ~want_push

        step_x = tc_max >= tcox
        step_y = tc_max >= tcoy
        step_z = tc_max >= tcoz
        step_mask = step_x.astype(i32) | (step_y.astype(i32) << 1) | (step_z.astype(i32) << 2)
        adv_posx = posx - jnp.where(step_x, scale_exp2, 0.0)
        adv_posy = posy - jnp.where(step_y, scale_exp2, 0.0)
        adv_posz = posz - jnp.where(step_z, scale_exp2, 0.0)
        adv_idx = idx ^ step_mask

        # ---- POP (glsl:335-391) ------------------------------------------------
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
        pop_pp = jnp.where(pop_lv, stack_pp, 0).sum(axis=0).astype(u32)
        pop_t_max = jnp.where(pop_lv, stack_tmax, 0.0).sum(axis=0)

        sc = jnp.clip(pop_scale, 0, MAX_SCALE).astype(u32)
        shx = f32_bits(adv_posx) >> sc
        shy = f32_bits(adv_posy) >> sc
        shz = f32_bits(adv_posz) >> sc
        pop_posx = jax.lax.bitcast_convert_type(shx << sc, f32)
        pop_posy = jax.lax.bitcast_convert_type(shy << sc, f32)
        pop_posz = jax.lax.bitcast_convert_type(shz << sc, f32)
        pop_idx = ((shx & 1) | ((shy & 1) << 1) | ((shz & 1) << 2)).astype(i32)

        # ---- merge -------------------------------------------------------------
        def sel(push_v, pop_v, adv_v, old_v):
            v = jnp.where(want_push, push_v, old_v)
            v = jnp.where(advance, adv_v, v)
            v = jnp.where(do_pop, pop_v, v)
            return v

        pp = sel(push_pp, pop_pp, pp, pp)
        idx = sel(push_idx, pop_idx, adv_idx, idx)
        scale = sel(push_scale, pop_scale, scale, scale)
        posx = sel(push_posx, pop_posx, adv_posx, posx)
        posy = sel(push_posy, pop_posy, adv_posy, posy)
        posz = sel(push_posz, pop_posz, adv_posz, posz)
        t_min = jnp.where(advance, tc_max, t_min)
        t_max = sel(tv_max, pop_t_max, t_max, t_max)
        h = jnp.where(do_pop, 0.0, h_new)

        return (active, hit, inside, pp, idx, scale, posx, posy, posz, t_min,
                t_max, h, adj_last, stack_pp, stack_tmax)

    posx0 = jnp.where(in_x, 1.5, 1.0).astype(f32)
    posy0 = jnp.where(in_y, 1.5, 1.0).astype(f32)
    posz0 = jnp.where(in_z, 1.5, 1.0).astype(f32)

    state0 = (
        jnp.ones(B, bool),                      # active
        jnp.zeros(B, bool),                     # hit
        jnp.zeros(B, bool),                     # inside_voxel
        jnp.zeros(B, u32),                      # pp (ptr | pidx<<28)
        idx0,                                   # idx
        jnp.full(B, MAX_SCALE - 1, i32),        # scale
        posx0, posy0, posz0,
        t_min0, t_max0, t_max0,                 # t_min, t_max, h
        jnp.full(B, 0x00FFFFFF, u32),           # adj_last (count<<24 | last)
        jnp.zeros((H, B), u32),                 # stack_pp
        jnp.zeros((H, B), f32),                 # stack_tmax
    )

    if record_trace:
        # Trace-recording variant used by shader-style tests: separate, simple
        # path with per-step appends (slow, small batches only).
        def fetch_descriptor(ptr, pidx):
            d = row_word(gather_row(ptr), pidx // 2)
            return jnp.where(pidx % 2 != 0, d >> jnp.uint32(16), d)

        return _traced_traversal(
            octree_scale, state0, step, hit_phase, fetch_descriptor,
            max_steps, B,
        )

    def cond(carry):
        it, s = carry
        return (it < max_steps) & jnp.any(s[0])

    def body(carry):
        it, s = carry
        for _ in range(unroll):
            s = step(s)
        return it + unroll, s

    steps_used, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))

    return _finalize(state, hit_phase, octree_scale, steps_used, B,
                     (rox, roy, roz), (rdx, rdy, rdz))


def _finalize(state, hit_phase, octree_scale, steps_used, B, ro_s, rd_s):
    """Recompute the full hit record from frozen per-ray state (one pass)."""
    (active, hit, inside, pp, idx, scale, posx, posy, posz, t_min, t_max,
     h, adj_last, stack_pp, stack_tmax) = state
    f32 = jnp.float32
    rox, roy, roz = ro_s
    rdx, rdy, rdz = rd_s

    leaf_value, face_id, ux, uy, dst, tex_lod, (upx, upy, upz) = hit_phase(
        pp, idx, scale, posx, posy, posz, t_min
    )
    scale_exp2 = _exp2_scale(scale)

    hx = jnp.clip(rox + t_min * rdx, upx + EPSILON, upx + scale_exp2 - EPSILON)
    hy = jnp.clip(roy + t_min * rdy, upy + EPSILON, upy + scale_exp2 - EPSILON)
    hz = jnp.clip(roz + t_min * rdz, upz + EPSILON, upz + scale_exp2 - EPSILON)
    hit_pos = (jnp.stack([hx, hy, hz], -1) - 1.0) / octree_scale

    return TraversalResult(
        t=jnp.where(hit, dst, -1.0).astype(f32),
        value=jnp.where(hit, leaf_value, 0).astype(jnp.uint32),
        face_id=jnp.where(hit, face_id, 0).astype(jnp.int32),
        pos=jnp.where(hit[:, None], hit_pos, 0.0).astype(f32),
        uv=jnp.where(hit[:, None], jnp.stack([ux, uy], -1), 0.0).astype(f32),
        lod=jnp.where(hit, tex_lod, 0.0).astype(f32),
        inside_voxel=inside,
        steps=jnp.broadcast_to(steps_used, (B,)),
        trace=None,
    )


def _traced_traversal(octree_scale, state0, step, hit_phase,
                      fetch_descriptor, max_steps, B):
    """Slow trace-recording path for step-trace tests: record
    (t, ptr, octant_idx, parent_idx, scale, is_child, is_leaf) per step."""
    i32 = jnp.int32
    u32 = jnp.uint32

    trace_t = jnp.full((B, max_steps), -1.0, jnp.float32)
    trace_i = jnp.full((B, max_steps, 7), -1, i32)
    trace_n = jnp.zeros(B, i32)

    # recover octant_mask from closure: recompute inside loop via hit_phase
    def body(carry):
        it, s, trace_t, trace_i, trace_n = carry
        active = s[0]
        pp, idx, scale = s[3], s[4], s[5]
        t_min = s[9]
        ptr = pp & PTR_MASK
        pidx = (pp >> PTR_BITS).astype(i32)

        # descriptor fetch mirrors step() for trace fields
        descriptor = fetch_descriptor(ptr, pidx)
        # octant_idx must match step(): idx ^ octant_mask; hit_phase computes
        # it internally — recompute via leaf gather path
        octant_idx = _octant_idx_from(hit_phase, pp, idx, scale, s)
        bit = (jnp.uint32(1) << octant_idx).astype(u32)
        is_child = (descriptor & (bit << jnp.uint32(8))) != 0
        is_leaf = (descriptor & bit) != 0

        nc = jnp.clip(trace_n, 0, max_steps - 1)
        lanes = jnp.arange(B)
        row = jnp.stack(
            [ptr.astype(i32), octant_idx.astype(i32), pidx, scale,
             is_child.astype(i32), is_leaf.astype(i32), jnp.zeros(B, i32)],
            axis=-1,
        )
        trace_t = trace_t.at[lanes, nc].set(
            jnp.where(active, t_min / octree_scale, trace_t[lanes, nc])
        )
        trace_i = trace_i.at[lanes, nc].set(
            jnp.where(active[:, None], row, trace_i[lanes, nc])
        )
        trace_n = trace_n + active.astype(i32)

        return it + 1, step(s), trace_t, trace_i, trace_n

    def cond(carry):
        it, s = carry[0], carry[1]
        return (it < max_steps) & jnp.any(s[0])

    it, state, trace_t, trace_i, trace_n = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state0, trace_t, trace_i, trace_n)
    )

    # finalize without ray constants: reuse hit_phase via closure
    res = _finalize_from_traced(state, hit_phase, octree_scale, it, B)
    trace = {
        "t": trace_t,
        "ptr": trace_i[..., 0],
        "idx": trace_i[..., 1],
        "parent_idx": trace_i[..., 2],
        "scale": trace_i[..., 3],
        "is_child": trace_i[..., 4],
        "is_leaf": trace_i[..., 5],
        "n": trace_n,
    }
    return res._replace(trace=trace)


def _octant_idx_from(hit_phase, pp, idx, scale, s):
    # hit_phase closes over octant_mask; cheapest access is recompute:
    # face/uv depend on it, but octant_idx itself = idx ^ octant_mask is
    # not directly exposed. Instead reconstruct from the leaf gather in
    # hit_phase? Simpler: stash octant_mask on the function object.
    return (idx ^ hit_phase.octant_mask).astype(jnp.uint32)


def _finalize_from_traced(state, hit_phase, octree_scale, steps_used, B):
    return _finalize(
        state, hit_phase, octree_scale, steps_used, B,
        hit_phase.ro_s, hit_phase.rd_s,
    )
