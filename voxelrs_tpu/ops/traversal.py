"""Batched ESVO ray traversal — the core device kernel.

A functional, lane-masked port of the Laine–Karras sparse-voxel-octree
raytracer (reference: assets/shaders/svo.esvo.glsl:50-393, after
"Efficient Sparse Voxel Octrees", Laine & Karras 2010). One GLSL thread per
pixel becomes a ``(B,)`` ray batch stepped together inside a
``lax.while_loop``; rays retire by masking. All float bit tricks (mantissa
PUSH/ADVANCE/POP, findMSB multi-level ascent, signed-epsilon substitution)
are preserved exactly via bitcasts.

TPU-shaped state design (each choice measured on v5e):
- One row gather per step: the preamble is padded to a full 12-u32 block so
  EVERY block is row-aligned and a single (N/12, 12) gather fetches header +
  body; word selection within rows is a cheap masked reduce.
- Per-ray stacks are ``(H, B)`` arrays updated with one-hot masked selects —
  ~500x faster than scatter updates; ptr and parent-idx pack into one u32.
- The loop carries NO result arrays: a ray's state freezes when it retires
  and the hit record is recomputed from frozen state post-loop.
- ``intersect_octree_deferred`` runs translucency at picker cost: the loop
  stops at every leaf (1 gather/step), texel alpha is judged *between*
  resume rounds instead of inside the loop (3 gathers/step).

The SVO buffer layout consumed here is produced by
``voxelrs_tpu.world.esvo``: a 12-word preamble block, then octant blocks;
``octree_scale = 2^-depth``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as _np

from .bits import (
    EPSILON,
    MAX_SCALE,
    copysign_epsilon,
    f32_bits,
    find_msb,
    smoothstep,
)

MAX_STEPS = 1000
# NUMPY scalars, NOT jnp scalars: module-level jnp constants get hoisted
# into jaxpr argument slots whose compile-vs-dispatch bookkeeping miscounts
# on jax 0.9 (see traversal_csvo.py); numpy scalars inline as HLO literals
RELATIVE_BIT = _np.uint32(1 << 31)
# ptr | parent_idx << 28 packing limits the SVO buffer to 2^28 u32 = 1 GiB
PTR_BITS = 28
PTR_MASK = _np.uint32((1 << PTR_BITS) - 1)
STACK_HEIGHT = 12  # supports world depth ≤ 12 (radius 64 chunks)
_NO_VALUE = _np.uint32(0x00FFFFFF)

f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32


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


class RayConsts(NamedTuple):
    """Per-ray loop invariants (mirrored FMA coefficients etc.)."""

    rox: jnp.ndarray
    roy: jnp.ndarray
    roz: jnp.ndarray
    rdx: jnp.ndarray
    rdy: jnp.ndarray
    rdz: jnp.ndarray
    tcx: jnp.ndarray
    tcy: jnp.ndarray
    tcz: jnp.ndarray
    tbx: jnp.ndarray
    tby: jnp.ndarray
    tbz: jnp.ndarray
    mirror_x: jnp.ndarray
    mirror_y: jnp.ndarray
    mirror_z: jnp.ndarray
    octant_mask: jnp.ndarray
    max_dst: jnp.ndarray
    octree_scale: jnp.ndarray


class State(NamedTuple):
    active: jnp.ndarray
    hit: jnp.ndarray
    inside: jnp.ndarray
    pp: jnp.ndarray  # ptr | parent_idx << 28
    idx: jnp.ndarray
    scale: jnp.ndarray
    posx: jnp.ndarray
    posy: jnp.ndarray
    posz: jnp.ndarray
    t_min: jnp.ndarray
    t_max: jnp.ndarray
    h: jnp.ndarray
    adj_last: jnp.ndarray  # adjacent count << 24 | last leaf value (24 bits)
    missed: jnp.ndarray  # any miss step since last reset (deferred rounds)
    suppress: jnp.ndarray  # pass through the next leaf hit (deferred resume)
    stack_pp: jnp.ndarray
    stack_tmax: jnp.ndarray


def _exp2_scale(scale):
    """Exact 2^(scale - MAX_SCALE) via exponent-bit construction."""
    return jax.lax.bitcast_convert_type(
        ((scale - MAX_SCALE + 127) << 23).astype(i32), f32
    )


def make_ray_consts(octree_scale, ro, rd, max_dst) -> RayConsts:
    """Coordinate shift to [1;2), epsilon substitution, direction mirroring
    (reference: svo.esvo.glsl:51-124)."""
    B = ro.shape[0]
    octree_scale = jnp.asarray(octree_scale, f32)
    max_dst = jnp.broadcast_to(jnp.asarray(max_dst, f32), (B,)) * octree_scale

    rox = ro[:, 0] * octree_scale + 1.0
    roy = ro[:, 1] * octree_scale + 1.0
    roz = ro[:, 2] * octree_scale + 1.0
    rdx = copysign_epsilon(rd[:, 0])
    rdy = copysign_epsilon(rd[:, 1])
    rdz = copysign_epsilon(rd[:, 2])

    tcx = 1.0 / -jnp.abs(rdx)
    tcy = 1.0 / -jnp.abs(rdy)
    tcz = 1.0 / -jnp.abs(rdz)
    tbx = tcx * rox
    tby = tcy * roy
    tbz = tcz * roz

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

    return RayConsts(rox, roy, roz, rdx, rdy, rdz, tcx, tcy, tcz, tbx, tby,
                     tbz, mirror_x, mirror_y, mirror_z, octant_mask, max_dst,
                     octree_scale)


def init_state(c: RayConsts) -> State:
    """Entry/exit distances of the [1;2) cube and the initial octant
    (reference: svo.esvo.glsl:126-149)."""
    B = c.rox.shape[0]
    t_min = jnp.maximum(
        jnp.maximum(2.0 * c.tcx - c.tbx, 2.0 * c.tcy - c.tby), 2.0 * c.tcz - c.tbz
    )
    t_min = jnp.maximum(0.0, t_min)
    t_max = jnp.minimum(
        jnp.minimum(c.tcx - c.tbx, c.tcy - c.tby), c.tcz - c.tbz
    )
    in_x = t_min < 1.5 * c.tcx - c.tbx
    in_y = t_min < 1.5 * c.tcy - c.tby
    in_z = t_min < 1.5 * c.tcz - c.tbz
    idx = in_x.astype(i32) | (in_y.astype(i32) << 1) | (in_z.astype(i32) << 2)
    return State(
        active=jnp.ones(B, bool),
        hit=jnp.zeros(B, bool),
        inside=jnp.zeros(B, bool),
        pp=jnp.zeros(B, u32),
        idx=idx,
        scale=jnp.full(B, MAX_SCALE - 1, i32),
        posx=jnp.where(in_x, 1.5, 1.0).astype(f32),
        posy=jnp.where(in_y, 1.5, 1.0).astype(f32),
        posz=jnp.where(in_z, 1.5, 1.0).astype(f32),
        t_min=t_min,
        t_max=t_max,
        h=t_max,
        adj_last=jnp.full(B, 0x00FFFFFF, u32),
        missed=jnp.zeros(B, bool),
        suppress=jnp.zeros(B, bool),
        stack_pp=jnp.zeros((STACK_HEIGHT, B), u32),
        stack_tmax=jnp.zeros((STACK_HEIGHT, B), f32),
    )


def _make_rows(descriptors):
    n_rows = descriptors.shape[0] // 12
    return descriptors[: n_rows * 12].reshape(n_rows, 12)


def _row_word(row, widx):
    """Select word ``widx`` (B,) from each row (B, 12)."""
    iota = jnp.arange(row.shape[1], dtype=i32)[None, :]
    return (
        jnp.where(iota == widx[:, None], row, jnp.uint32(0)).sum(axis=1).astype(u32)
    )


def _gather_row(rows, ptr):
    r = jnp.clip((ptr // 12).astype(i32), 0, rows.shape[0] - 1)
    return rows[r]


def _resolve_ptr(raw, ptr, pidx):
    """Resolve relative/absolute child pointer (svo.esvo.glsl:9-16)."""
    rel = ptr + 4 + pidx + (raw & jnp.uint32(0x7FFFFFFF))
    return jnp.where((raw & RELATIVE_BIT) != 0, rel, raw).astype(u32)


def hit_phase(rows, c: RayConsts, pp, idx, scale, posx, posy, posz, t_min,
              row=None):
    """Candidate leaf-hit data, recomputable from (frozen) state.
    Returns (leaf_value, face_id, ux, uy, dst, tex_lod, upos).
    Reference: svo.esvo.glsl:185-237."""
    ptr = pp & PTR_MASK
    pidx = (pp >> PTR_BITS).astype(i32)
    octant_idx = (idx ^ c.octant_mask).astype(u32)

    if row is None:
        row = _gather_row(rows, ptr)
    raw = _row_word(row, 4 + pidx)
    next_ptr = _resolve_ptr(raw, ptr, pidx.astype(u32))
    child_row = _gather_row(rows, next_ptr)
    leaf_value = _row_word(child_row, 4 + octant_idx.astype(i32))
    return (leaf_value,) + _hit_geometry(c, octant_idx, scale, posx, posy,
                                         posz, t_min)


def hit_phase_fat(fat_rows, c: RayConsts, pp, idx, scale, posx, posy, posz,
                  t_min, child_ptr=None, value_override=None):
    """``hit_phase`` with the value fetches routed through the fat-row
    view (the 12-wide view's row count sits in the slow gather tier).
    ``child_ptr`` — the hit node's resolved block pointer, carried live in
    PushState and in the frozen record — skips the parent-pointer fetch:
    ONE row gather per lane instead of two (values bit-identical: it IS
    the pointer the skipped fetch would resolve). ``value_override`` —
    per-lane leaf values already carried by the caller (adaptive pipeline:
    merge-carried fills + compact refined-lane fetches) — skips the value
    fetch entirely; the phase is then pure math."""
    octant_idx = (idx ^ c.octant_mask).astype(u32)

    if value_override is not None:
        leaf_value = value_override
    else:
        pidx = (pp >> PTR_BITS).astype(i32)
        if child_ptr is None:
            ptr = pp & PTR_MASK
            (raw,) = _fetch_words(fat_rows, ptr, [4 + pidx])
            next_ptr = _resolve_ptr(raw, ptr, pidx.astype(u32))
        else:
            next_ptr = child_ptr
        (leaf_value,) = _fetch_words(fat_rows, next_ptr,
                                     [4 + octant_idx.astype(i32)])
    return (leaf_value,) + _hit_geometry(c, octant_idx, scale, posx, posy,
                                         posz, t_min)


def _hit_geometry(c: RayConsts, octant_idx, scale, posx, posy, posz, t_min):
    """Face id, uv, distance and texture lod of a candidate hit (pure math)."""
    scale_exp2 = _exp2_scale(scale)
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
        on_x,
        (c.roz + c.rdz * t2x) - upz,
        jnp.where(on_y, (c.rox + c.rdx * t2y) - upx, (c.rox + c.rdx * t2z) - upx),
    )
    uy = jnp.where(
        on_x,
        (c.roy + c.rdy * t2x) - upy,
        jnp.where(on_y, (c.roz + c.rdz * t2y) - upz, (c.roy + c.rdy * t2z) - upy),
    )
    ux = ux / scale_exp2
    uy = uy / scale_exp2
    ux = jnp.where(on_x & c.mirror_x, 1.0 - ux, ux)
    uy = jnp.where(on_y & c.mirror_y, 1.0 - uy, uy)
    ux = jnp.where(~on_x & ~on_y & ~c.mirror_z, 1.0 - ux, ux)

    dst = t_min / c.octree_scale
    tex_lod = smoothstep(15.0, 25.0, dst) * (dst - 15.0) * 0.05
    return face_id, ux, uy, dst, tex_lod, (upx, upy, upz)


def traversal_step(rows, c: RayConsts, s: State, cast_translucent: bool,
                   alpha_fn: Optional[Callable]) -> State:
    """One lock-step traversal step over all lanes
    (reference: svo.esvo.glsl:152-392)."""
    B = s.active.shape[0]
    stack_base = MAX_SCALE - STACK_HEIGHT

    ptr = s.pp & PTR_MASK
    pidx = (s.pp >> PTR_BITS).astype(i32)
    scale_exp2 = _exp2_scale(s.scale)
    adj_count = (s.adj_last >> 24).astype(i32)
    last_value = s.adj_last & _NO_VALUE

    # distance-limit early out (glsl:153-156)
    active = s.active & ~((c.max_dst >= 0) & (s.t_min > c.max_dst))

    tcox = s.posx * c.tcx - c.tbx
    tcoy = s.posy * c.tcy - c.tby
    tcoz = s.posz * c.tcz - c.tbz
    tc_max = jnp.minimum(jnp.minimum(tcox, tcoy), tcoz)

    octant_idx = (s.idx ^ c.octant_mask).astype(u32)
    bit = (jnp.uint32(1) << octant_idx).astype(u32)

    row = _gather_row(rows, ptr)  # the step's single block fetch
    descriptor = _row_word(row, pidx // 2)
    descriptor = jnp.where(pidx % 2 != 0, descriptor >> jnp.uint32(16), descriptor)
    is_child = (descriptor & (bit << jnp.uint32(8))) != 0
    is_leaf = (descriptor & bit) != 0

    hit_branch = is_child & (s.t_min <= s.t_max)
    inside = s.inside | (active & hit_branch & is_leaf & (s.t_min == 0))

    # ---- HIT: leaf with positive travel (glsl:185-265) -----------------
    leaf_hit = hit_branch & is_leaf & (s.t_min > 0)

    if cast_translucent and alpha_fn is not None:
        leaf_value, face_id, ux, uy, _, tex_lod, _ = hit_phase(
            rows, c, s.pp, s.idx, s.scale, s.posx, s.posy, s.posz, s.t_min,
            row=row,
        )
        alpha = alpha_fn(leaf_value, face_id, jnp.stack([ux, uy], -1), tex_lod)
        first_of_kind = (adj_count == 0) | ((leaf_value & _NO_VALUE) != last_value)
        accept = active & leaf_hit & (alpha > 0) & first_of_kind
        passthrough = active & leaf_hit & ~accept
        adj_count = jnp.where(passthrough, jnp.minimum(adj_count + 1, 255), adj_count)
        last_value = jnp.where(passthrough, leaf_value & _NO_VALUE, last_value)
    else:
        # opaque / deferred: stop at every leaf, except a freshly resumed
        # lane passes its (already judged) leaf once
        accept = active & leaf_hit & ~s.suppress

    suppress = s.suppress & ~leaf_hit

    miss = active & ~hit_branch
    adj_count = jnp.where(miss, 0, adj_count)
    last_value = jnp.where(miss, _NO_VALUE, last_value)
    adj_last = (adj_count.astype(u32) << 24) | last_value
    missed = s.missed | miss

    hit = s.hit | accept
    active = active & ~accept

    # ---- PUSH (glsl:266-311) ---------------------------------------------
    half_scale = scale_exp2 * 0.5
    t_center_x = half_scale * c.tcx + tcox
    t_center_y = half_scale * c.tcy + tcoy
    t_center_z = half_scale * c.tcz + tcoz
    tv_max = jnp.minimum(s.t_max, tc_max)

    want_push = active & hit_branch & ~(is_leaf & (s.t_min > 0)) & (s.t_min <= tv_max)

    slot = s.scale - stack_base
    lv = jnp.arange(STACK_HEIGHT, dtype=i32)[:, None] == slot[None, :]
    do_store = (want_push & (tc_max < s.h))[None, :] & lv
    stack_pp = jnp.where(do_store, s.pp[None, :], s.stack_pp)
    stack_tmax = jnp.where(do_store, s.t_max[None, :], s.stack_tmax)
    h_new = jnp.where(want_push, tc_max, s.h)

    next_ptr = _resolve_ptr(_row_word(row, 4 + pidx), ptr, pidx.astype(u32))
    push_pp = (next_ptr & PTR_MASK) | (octant_idx << PTR_BITS)
    push_scale = s.scale - 1

    pin_x = s.t_min < t_center_x
    pin_y = s.t_min < t_center_y
    pin_z = s.t_min < t_center_z
    push_idx = pin_x.astype(i32) | (pin_y.astype(i32) << 1) | (pin_z.astype(i32) << 2)
    push_posx = s.posx + jnp.where(pin_x, half_scale, 0.0)
    push_posy = s.posy + jnp.where(pin_y, half_scale, 0.0)
    push_posz = s.posz + jnp.where(pin_z, half_scale, 0.0)

    # ---- ADVANCE (glsl:319-331) ---------------------------------------------
    advance = active & ~want_push

    step_x = tc_max >= tcox
    step_y = tc_max >= tcoy
    step_z = tc_max >= tcoz
    step_mask = step_x.astype(i32) | (step_y.astype(i32) << 1) | (step_z.astype(i32) << 2)
    adv_posx = s.posx - jnp.where(step_x, scale_exp2, 0.0)
    adv_posy = s.posy - jnp.where(step_y, scale_exp2, 0.0)
    adv_posz = s.posz - jnp.where(step_z, scale_exp2, 0.0)
    adv_idx = s.idx ^ step_mask

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

    pop_slot = jnp.clip(pop_scale - stack_base, 0, STACK_HEIGHT - 1)
    pop_lv = jnp.arange(STACK_HEIGHT, dtype=i32)[:, None] == pop_slot[None, :]
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

    def sel(push_v, pop_v, adv_v, old_v):
        v = jnp.where(want_push, push_v, old_v)
        v = jnp.where(advance, adv_v, v)
        v = jnp.where(do_pop, pop_v, v)
        return v

    return State(
        active=active,
        hit=hit,
        inside=inside,
        pp=sel(push_pp, pop_pp, s.pp, s.pp),
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
        stack_pp=stack_pp,
        stack_tmax=stack_tmax,
    )


# ---------------------------------------------------------------------------
# Push-driven traversal engine (the fast path for opaque/deferred casts).
#
# Measured on v5e (scripts/gather_probe.py): XLA's in-loop gather cost is per
# ROW, nearly independent of row width up to 108 u32 (4.0 ms/M fetches for
# tables <= 32K rows, 12.1 ms/M above). The classic loop pays one row gather
# per traversal step; but only PUSH steps actually need memory:
#   - ADVANCE stays inside the same node -> descriptor already known;
#   - POP returns to an ancestor -> its (descriptor, child pointer) pair can
#     be restored from a one-hot stack (sound because the Laine-Karras `h`
#     stack-write elision only skips writes whose values would be identical,
#     and (desc, child_ptr) are a function of the node identity in pp);
#   - PUSH descends into an unvisited block -> must fetch.
# So the loop carries two extra per-ray registers (desc, child_ptr), fetches
# only to serve pending pushes, and runs SUBSTEPS fetch-free vector steps per
# fetch. The SVO buffer is additionally viewed as (N/108, 108) "fat rows"
# (9 blocks per row) so the per-iteration gather rides the cheap wide-row
# path and the table row count stays under the 32K fast-tier cliff.
# ---------------------------------------------------------------------------

FAT_BLOCKS = 9  # blocks per fat row; 9*12 = 108 words (widest free fetch)
FAT_WIDTH = FAT_BLOCKS * 12


def _occ_on() -> bool:
    """Occupancy-register fetch-free leaf pushes (VOXELRS_OCC=1 enables).

    Off by default: measured on the bench scene, only scale-1 pushes qualify
    (children of a scale-1 node are leaves by construction, deeper descents
    still need the child pointer), so iterations drop just ~10% while the
    occupancy refill (second gather + 4 word extracts per fetch phase) adds
    ~50% to the fetch cost — a net loss (scripts/occ_probe.py)."""
    import os

    return os.environ.get("VOXELRS_OCC", "0") == "1"


def _defer_on() -> bool:
    """Deferred stack-flush (buffered pending stack write, flushed once per
    fetch phase). VOXELRS_DEFER_FLUSH=0 restores the per-substep immediate
    one-hot stack write (A/B knob for the round-4 snapshot change)."""
    import os

    return os.environ.get("VOXELRS_DEFER_FLUSH", "1") != "0"


class PushState(NamedTuple):
    """State plus cached node registers for the push-driven engine.

    Stack slimming (round 4): the engine stacks only (desc, child_ptr) —
    the two values that genuinely need memory. On POP, the other two
    values the classic engine stacked are reconstructed instead:

    - ``t_max`` (the popped-to node's cube exit) is recomputed from the
      ancestor corner ``trunc(pos, scale+1)``: positions are exact dyadic
      rationals maintained by exact fp adds/subs, plane distances
      ``pos*tc - tb`` are fp-monotone in ``pos``, and child cubes nest in
      parents, so ``min(t_max_parent, tc_max_child) == tc_max_child``
      exactly in fp — the stacked value IS the recomputable one.
    - ``pp`` (the popped-to node = parent-block ptr | octant idx) is
      derived integer-exactly: the parent's block ptr is the grandparent's
      ``child_ptr`` read from the stack one slot up, and the octant index
      is the mirrored pos bit at the parent scale. The root (top slot)
      has ``pp = 0`` by construction.

    This halves per-substep stack bandwidth (the one-hot (H, B) selects
    rewrite every row every substep), the dominant substep cost at
    500K+ lanes (docs/PERF.md round-4 substep audit). The Laine–Karras
    ``h`` write-elision is dropped with the t_max stack: always-store is
    the trivially-equivalent variant (elision only skips writes whose
    values the read would never observe differently), and in the
    vectorized one-hot layout elision never saved bandwidth anyway."""

    active: jnp.ndarray
    hit: jnp.ndarray
    inside: jnp.ndarray
    pp: jnp.ndarray
    idx: jnp.ndarray
    scale: jnp.ndarray
    posx: jnp.ndarray
    posy: jnp.ndarray
    posz: jnp.ndarray
    t_min: jnp.ndarray
    t_max: jnp.ndarray
    adj_last: jnp.ndarray
    missed: jnp.ndarray
    suppress: jnp.ndarray
    desc: jnp.ndarray  # (B,) u32: current node's u16 descriptor
    child_ptr: jnp.ndarray  # (B,) u32: resolved pointer to current node's block
    need_fetch: jnp.ndarray  # (B,) bool: desc/child_ptr stale (pending push)
    stack_desc: jnp.ndarray
    stack_cptr: jnp.ndarray
    # pending stack write (deferred-flush registers): pushes record their
    # (slot, desc, child_ptr) here instead of rewriting the (H, B) stacks
    # every substep; the fetch phase flushes once per iteration. POP reads
    # consult the pending slot first, so reads-after-buffered-writes stay
    # exact. A push that would need a SECOND distinct pending slot within
    # one iteration (rare: one fetch-free descent + a later stalled push)
    # simply spins until the next flush — no state change, no semantics
    # change. This cuts the dominant substep bandwidth (2 full (H, B)
    # rewrites per substep -> per iteration).
    pend_slot: jnp.ndarray  # (B,) i32: stack slot of the buffered write (-1 = none)
    pend_desc: jnp.ndarray  # (B,) u32
    pend_cptr: jnp.ndarray  # (B,) u32
    # occupancy registers: words 0..3 of the block at ``c_owner`` (the 8 u16
    # descriptors of that node's children), loaded by the same fetch that
    # resolved child_ptr. While c_owner == child_ptr a push into a child
    # whose children are ALL leaves runs fetch-free: its descriptor is one
    # register select, and no deeper fetch can be needed (leaf hits retire,
    # misses advance/pop). This makes bottom-level surface skimming — the
    # dominant pattern for shadow and silhouette rays — fetch-free.
    c0: jnp.ndarray
    c1: jnp.ndarray
    c2: jnp.ndarray
    c3: jnp.ndarray
    c_owner: jnp.ndarray  # (B,) u32: block the c-regs describe (~0 = none)
    # restart floor: while t_min <= floor the lane is re-descending over
    # territory it already covered before a wavefront restart — miss steps
    # there must NOT touch the translucency adjacency bookkeeping (they
    # were either already accounted or are ULP-shifted re-tests); -1 when
    # not restarted (t_min >= 0 always)
    floor: jnp.ndarray


def _make_fat_rows(descriptors):
    n = descriptors.shape[0]
    n_rows = -(-n // FAT_WIDTH)
    pad = n_rows * FAT_WIDTH - n
    if pad:
        descriptors = jnp.pad(descriptors, (0, pad))
    return descriptors.reshape(n_rows, FAT_WIDTH)


def _fetch_words(fat_rows, ptr, widxs):
    """Fetch selected words of the block at word-address ``ptr``: one wide
    row gather + one fused one-hot reduce per word (measured: extracting a
    whole (B, 12) block via 9-way select costs ~1.7x the gather itself;
    direct per-word reduces over the 108 columns are far cheaper)."""
    blk = (ptr // 12).astype(i32)
    r = jnp.clip(blk // FAT_BLOCKS, 0, fat_rows.shape[0] - 1)
    base = (blk % FAT_BLOCKS) * 12
    fat = fat_rows[r]  # (B, FAT_WIDTH)
    iota = jnp.arange(FAT_WIDTH, dtype=i32)[None, :]
    outs = []
    for widx in widxs:
        sel = iota == (base + widx)[:, None]
        outs.append(jnp.where(sel, fat, jnp.uint32(0)).sum(axis=1).astype(u32))
    return outs


def _lane_to_u32(a):
    if a.dtype == jnp.bool_:
        return a.astype(u32)
    if a.dtype in (jnp.float32, jnp.int32):
        return jax.lax.bitcast_convert_type(a, u32)
    return a.astype(u32)


def _lane_from_u32(w, dtype):
    if dtype == jnp.bool_:
        return w != 0
    if dtype in (jnp.float32, jnp.int32):
        return jax.lax.bitcast_convert_type(w, dtype)
    return w.astype(dtype)


def pack_lane_state(state):
    """View a lane-state NamedTuple ((B,) scalars + (H, B) stacks) as ONE
    (B, W) u32 matrix (f32/i32 bit-cast, bools as 0/1, stacks transposed
    into H columns each).

    Rationale: XLA's gather cost on this hardware is per ROW for widths up
    to ~108 u32 (docs/PERF.md), so compacting the full wavefront state is
    ONE wide row gather (~4-12 ns/lane) on this packed view — versus ~W
    separate element gathers (~1.2 us/lane, the cost that originally
    motivated restart-based compaction) or a restart's ~stack-depth
    re-descent iterations at the new width (~56 ns/lane)."""
    cols = []
    for a in state:
        if a.ndim == 1:
            cols.append(_lane_to_u32(a)[:, None])
        else:  # (H, B) stack
            cols.append(_lane_to_u32(a).T)
    return jnp.concatenate(cols, axis=1)


def gather_lane_state(state, idx):
    """Compact a lane-state NamedTuple to the lanes in ``idx`` via one
    packed row gather; bit-exact state continuation (unlike a restart,
    which re-descends and re-tests with ULP-shifted entry points)."""
    packed = pack_lane_state(state)[idx]
    out = []
    col = 0
    for a in state:
        if a.ndim == 1:
            out.append(_lane_from_u32(packed[:, col], a.dtype))
            col += 1
        else:
            h = a.shape[0]
            out.append(_lane_from_u32(packed[:, col:col + h], a.dtype).T)
            col += h
    return type(state)(*out)


def _push_state_from(s: State, B: int, H: int, floor) -> PushState:
    """PushState from a base State (stacks re-sized to H, registers cold)."""
    return PushState(
        active=s.active, hit=s.hit, inside=s.inside, pp=s.pp, idx=s.idx,
        scale=s.scale, posx=s.posx, posy=s.posy, posz=s.posz,
        t_min=s.t_min, t_max=s.t_max, adj_last=s.adj_last,
        missed=s.missed, suppress=s.suppress,
        desc=jnp.zeros(B, u32),
        child_ptr=jnp.zeros(B, u32),
        need_fetch=jnp.ones(B, bool),  # first fetch loads the root registers
        stack_desc=jnp.zeros((H, B), u32),
        stack_cptr=jnp.zeros((H, B), u32),
        pend_slot=jnp.full(B, -1, i32),
        pend_desc=jnp.zeros(B, u32),
        pend_cptr=jnp.zeros(B, u32),
        floor=floor,
        c0=jnp.zeros(B, u32), c1=jnp.zeros(B, u32),
        c2=jnp.zeros(B, u32), c3=jnp.zeros(B, u32),
        c_owner=jnp.full(B, 0xFFFFFFFF, u32),
    )


def init_state_push(c: RayConsts, stack_height: int = STACK_HEIGHT) -> PushState:
    s = init_state(c)
    B = c.rox.shape[0]
    return _push_state_from(s, B, stack_height, jnp.full(B, -1.0, f32))


def restart_state_push(c: RayConsts, t_floor, inside, adj_last, missed,
                       suppress, stack_height: int = STACK_HEIGHT) -> PushState:
    """Fresh traversal state that resumes a ray mid-flight: the ESVO walk is
    memoryless given (ray, t_min), so a compacted lane restarts from the
    root with its old ``t_min`` as the entry floor and re-descends (~depth
    pushes) instead of carrying its stacks through the compaction gather.
    The deferred-round bookkeeping (inside/adjacency/suppress) is carried."""
    s = init_state(c)
    t_min = jnp.maximum(s.t_min, t_floor)
    in_x = t_min < 1.5 * c.tcx - c.tbx
    in_y = t_min < 1.5 * c.tcy - c.tby
    in_z = t_min < 1.5 * c.tcz - c.tbz
    idx = in_x.astype(i32) | (in_y.astype(i32) << 1) | (in_z.astype(i32) << 2)
    s = s._replace(
        t_min=t_min,
        idx=idx,
        posx=jnp.where(in_x, 1.5, 1.0).astype(f32),
        posy=jnp.where(in_y, 1.5, 1.0).astype(f32),
        posz=jnp.where(in_z, 1.5, 1.0).astype(f32),
        inside=inside,
        adj_last=adj_last,
        missed=missed,
        suppress=suppress,
        # a restarted ray past the cube exit has already left the world
        active=s.active & (t_min <= s.t_max),
    )
    B = c.rox.shape[0]
    return _push_state_from(s, B, stack_height, s.t_min)


def flush_pending(s: PushState) -> PushState:
    """Flush the buffered stack write into the (H, B) stacks: ONE one-hot
    rewrite per stack per iteration (vs one per substep pre-buffering)."""
    H = s.stack_desc.shape[0]
    have = s.pend_slot >= 0
    lv = jnp.arange(H, dtype=i32)[:, None] == s.pend_slot[None, :]
    do_store = have[None, :] & lv
    return s._replace(
        stack_desc=jnp.where(do_store, s.pend_desc[None, :], s.stack_desc),
        stack_cptr=jnp.where(do_store, s.pend_cptr[None, :], s.stack_cptr),
        pend_slot=jnp.full_like(s.pend_slot, -1),
    )


def fetch_phase(fat_rows, s: PushState) -> PushState:
    """Serve pending pushes: load the pushed-into node's descriptor and its
    resolved child pointer (one wide gather; non-fetching lanes keep theirs),
    plus the node's own block header (its children's 8 descriptors) into the
    occupancy registers via a second gather — later pushes into all-leaf
    children then run fetch-free (see PushState.c0)."""
    s = flush_pending(s)
    ptr = s.pp & PTR_MASK
    pidx = (s.pp >> PTR_BITS).astype(i32)
    raw_desc, raw_ptr = _fetch_words(fat_rows, ptr, [pidx // 2, 4 + pidx])
    desc_new = jnp.where(pidx % 2 != 0, raw_desc >> jnp.uint32(16), raw_desc)
    desc_new = desc_new & jnp.uint32(0xFFFF)
    cptr_new = _resolve_ptr(raw_ptr, ptr, pidx.astype(u32))
    take = s.need_fetch
    s = s._replace(
        desc=jnp.where(take, desc_new, s.desc),
        child_ptr=jnp.where(take, cptr_new, s.child_ptr),
        need_fetch=jnp.zeros_like(s.need_fetch),
    )
    if _occ_on():
        c0, c1, c2, c3 = _fetch_words(fat_rows, cptr_new, [0, 1, 2, 3])
        s = s._replace(
            c0=jnp.where(take, c0, s.c0),
            c1=jnp.where(take, c1, s.c1),
            c2=jnp.where(take, c2, s.c2),
            c3=jnp.where(take, c3, s.c3),
            c_owner=jnp.where(take, cptr_new, s.c_owner),
        )
    return s


def substep(c: RayConsts, s: PushState, opaque: bool = False) -> PushState:
    """One fetch-free traversal step (opaque/deferred semantics: the loop
    stops at every leaf). Lanes awaiting a fetch stall; POP restores the node
    registers from the stacks. Mirrors ``traversal_step`` exactly otherwise.

    ``opaque`` (static): the caller guarantees every leaf hit retires the
    lane (opaque-world pipeline) — the translucency bookkeeping
    (adjacency counts, miss flags, suppress/floor resume logic) is
    skipped and those carries pass through unchanged, so XLA aliases
    them instead of rewriting ~6 lane-words per substep."""
    B = s.active.shape[0]
    H = s.stack_desc.shape[0]  # sized to world depth by the caller
    stack_base = MAX_SCALE - H

    scale_exp2 = _exp2_scale(s.scale)

    # distance-limit early out (state-only; applies to stalled lanes too)
    active = s.active & ~((c.max_dst >= 0) & (s.t_min > c.max_dst))
    runnable = active & ~s.need_fetch

    tcox = s.posx * c.tcx - c.tbx
    tcoy = s.posy * c.tcy - c.tby
    tcoz = s.posz * c.tcz - c.tbz
    tc_max = jnp.minimum(jnp.minimum(tcox, tcoy), tcoz)

    octant_idx = (s.idx ^ c.octant_mask).astype(u32)
    bit = (jnp.uint32(1) << octant_idx).astype(u32)
    is_child = (s.desc & (bit << jnp.uint32(8))) != 0
    is_leaf = (s.desc & bit) != 0

    hit_branch = is_child & (s.t_min <= s.t_max)
    inside = s.inside | (runnable & hit_branch & is_leaf & (s.t_min == 0))

    # HIT: deferred semantics — stop at every leaf except a freshly resumed
    # lane, which passes its already-judged leaf once. The pending pass is
    # only honored while the lane still sits at the resume point
    # (t_min <= floor); if a restart's ULP shift skipped the judged leaf,
    # the pass expires rather than swallowing the next real surface.
    leaf_hit = runnable & hit_branch & is_leaf & (s.t_min > 0)
    if opaque:
        # nothing to suppress or count: every leaf hit is final
        accept = leaf_hit
        suppress = s.suppress
        adj_last = s.adj_last
        missed = s.missed
    else:
        adj_count = (s.adj_last >> 24).astype(i32)
        last_value = s.adj_last & _NO_VALUE
        sup_active = s.suppress & (s.t_min <= s.floor)
        accept = leaf_hit & ~sup_active
        suppress = s.suppress & ~leaf_hit & (s.t_min <= s.floor)

        # misses while re-descending over pre-restart territory (t_min still
        # at the restart floor) are re-tests, not new traversal — adjacency
        # bookkeeping only reacts to misses past the floor
        miss = runnable & ~hit_branch & (s.t_min > s.floor)
        adj_count = jnp.where(miss, 0, adj_count)
        last_value = jnp.where(miss, _NO_VALUE, last_value)
        adj_last = (adj_count.astype(u32) << 24) | last_value
        missed = s.missed | miss

    hit = s.hit | accept
    active = active & ~accept
    runnable = runnable & ~accept

    # ---- PUSH ------------------------------------------------------------
    half_scale = scale_exp2 * 0.5
    t_center_x = half_scale * c.tcx + tcox
    t_center_y = half_scale * c.tcy + tcoy
    t_center_z = half_scale * c.tcz + tcoz
    tv_max = jnp.minimum(s.t_max, tc_max)

    want_push_raw = (
        runnable & hit_branch & ~(is_leaf & (s.t_min > 0)) & (s.t_min <= tv_max)
    )

    # buffered stack write: a push records (slot, desc, child_ptr) in the
    # pending registers; the fetch phase flushes them. If the pending slot
    # is occupied by a DIFFERENT slot (a second distinct-level push within
    # one iteration), the push is deferred — the lane keeps its state
    # unchanged this substep and retries after the next flush.
    slot = s.scale - stack_base
    if _defer_on():
        pend_ok = (s.pend_slot < 0) | (s.pend_slot == slot)
        want_push = want_push_raw & pend_ok
        pend_slot = jnp.where(want_push, slot, s.pend_slot)
        pend_desc = jnp.where(want_push, s.desc, s.pend_desc)
        pend_cptr = jnp.where(want_push, s.child_ptr, s.pend_cptr)
        stack_desc = s.stack_desc
        stack_cptr = s.stack_cptr
    else:
        # immediate per-substep one-hot stack write (pre-buffering variant)
        want_push = want_push_raw
        lv = jnp.arange(H, dtype=i32)[:, None] == slot[None, :]
        do_store = want_push[None, :] & lv
        stack_desc = jnp.where(do_store, s.desc[None, :], s.stack_desc)
        stack_cptr = jnp.where(do_store, s.child_ptr[None, :], s.stack_cptr)
        pend_slot, pend_desc, pend_cptr = s.pend_slot, s.pend_desc, s.pend_cptr

    push_pp = (s.child_ptr & PTR_MASK) | (octant_idx << PTR_BITS)
    push_scale = s.scale - 1

    # fetch-free push: while the occupancy registers describe the current
    # block (c_owner == child_ptr), the pushed-into child's descriptor is a
    # register select; if every child of THAT node is a leaf, no deeper
    # fetch can be needed (leaf hits retire, misses advance/pop), so the
    # push completes without stalling for the fetch phase. t_min > 0
    # guarantees no inside-voxel leaf descent below. Values are bit-identical
    # to what the skipped fetch would read (same words of the same block).
    if _occ_on():
        wi = (octant_idx >> jnp.uint32(1)).astype(i32)
        w = jnp.where(wi == 0, s.c0,
                      jnp.where(wi == 1, s.c1, jnp.where(wi == 2, s.c2, s.c3)))
        desc_c = jnp.where((octant_idx & jnp.uint32(1)) != 0,
                           w >> jnp.uint32(16), w) & jnp.uint32(0xFFFF)
        all_leaf_below = ((desc_c >> jnp.uint32(8)) & ~desc_c
                          & jnp.uint32(0xFF)) == 0
        fetch_free = (want_push & (s.c_owner == s.child_ptr) & all_leaf_below
                      & (s.t_min > 0))
    else:
        desc_c = s.desc
        fetch_free = jnp.zeros_like(want_push)

    pin_x = s.t_min < t_center_x
    pin_y = s.t_min < t_center_y
    pin_z = s.t_min < t_center_z
    push_idx = pin_x.astype(i32) | (pin_y.astype(i32) << 1) | (pin_z.astype(i32) << 2)
    push_posx = s.posx + jnp.where(pin_x, half_scale, 0.0)
    push_posy = s.posy + jnp.where(pin_y, half_scale, 0.0)
    push_posz = s.posz + jnp.where(pin_z, half_scale, 0.0)

    # ---- ADVANCE -----------------------------------------------------------
    # (deferred pushes neither advance nor pop: they spin in place)
    advance = runnable & ~want_push_raw

    step_x = tc_max >= tcox
    step_y = tc_max >= tcoy
    step_z = tc_max >= tcoz
    step_mask = step_x.astype(i32) | (step_y.astype(i32) << 1) | (step_z.astype(i32) << 2)
    adv_posx = s.posx - jnp.where(step_x, scale_exp2, 0.0)
    adv_posy = s.posy - jnp.where(step_y, scale_exp2, 0.0)
    adv_posz = s.posz - jnp.where(step_z, scale_exp2, 0.0)
    adv_idx = s.idx ^ step_mask

    # ---- POP (fetch-free: node registers restored from the stacks) --------
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
    iota_h = jnp.arange(H, dtype=i32)[:, None]
    pop_lv = iota_h == pop_slot[None, :]
    pop_lv1 = iota_h == (pop_slot + 1)[None, :]
    pop_desc = jnp.where(pop_lv, s.stack_desc, 0).sum(axis=0).astype(u32)
    pop_cptr = jnp.where(pop_lv, s.stack_cptr, 0).sum(axis=0).astype(u32)
    par_cptr = jnp.where(pop_lv1, s.stack_cptr, 0).sum(axis=0).astype(u32)
    # reads-after-buffered-writes: the pending slot shadows the stack (a
    # popping lane never pushes in the same substep, so its pending entry
    # is from an earlier substep of this iteration)
    pop_hit = s.pend_slot == pop_slot
    pop_hit1 = s.pend_slot == pop_slot + 1
    pop_desc = jnp.where(pop_hit, s.pend_desc, pop_desc)
    pop_cptr = jnp.where(pop_hit, s.pend_cptr, pop_cptr)
    par_cptr = jnp.where(pop_hit1, s.pend_cptr, par_cptr)

    sc = jnp.clip(pop_scale, 0, MAX_SCALE).astype(u32)
    shx = f32_bits(adv_posx) >> sc
    shy = f32_bits(adv_posy) >> sc
    shz = f32_bits(adv_posz) >> sc
    pop_posx = jax.lax.bitcast_convert_type(shx << sc, f32)
    pop_posy = jax.lax.bitcast_convert_type(shy << sc, f32)
    pop_posz = jax.lax.bitcast_convert_type(shz << sc, f32)
    pop_idx = ((shx & 1) | ((shy & 1) << 1) | ((shz & 1) << 2)).astype(i32)

    # the popped-to node's identity, derived instead of stacked: its
    # descriptor-block ptr is the grandparent's child_ptr (one stack slot
    # up) and its index is the MIRRORED pos bit at the parent scale; the
    # top slot is the root, whose pp is 0 by construction
    sc1 = sc + jnp.uint32(1)
    par_bits = (
        ((shx >> jnp.uint32(1)) & 1)
        | (((shy >> jnp.uint32(1)) & 1) << 1)
        | (((shz >> jnp.uint32(1)) & 1) << 2)
    ).astype(i32)
    par_octant = (par_bits ^ c.octant_mask).astype(u32)
    pop_pp = jnp.where(
        pop_slot >= H - 1,
        jnp.uint32(0),
        (par_cptr & PTR_MASK) | (par_octant << jnp.uint32(PTR_BITS)),
    )

    # the popped-to node's cube exit, recomputed from its corner (exact:
    # see PushState docstring) instead of stacked
    par_posx = jax.lax.bitcast_convert_type((shx >> jnp.uint32(1)) << sc1, f32)
    par_posy = jax.lax.bitcast_convert_type((shy >> jnp.uint32(1)) << sc1, f32)
    par_posz = jax.lax.bitcast_convert_type((shz >> jnp.uint32(1)) << sc1, f32)
    pop_t_max = jnp.minimum(
        jnp.minimum(par_posx * c.tcx - c.tbx, par_posy * c.tcy - c.tby),
        par_posz * c.tcz - c.tbz,
    )

    def sel(push_v, pop_v, adv_v, old_v):
        v = jnp.where(want_push, push_v, old_v)
        v = jnp.where(advance, adv_v, v)
        v = jnp.where(do_pop, pop_v, v)
        return v

    return PushState(
        active=active,
        hit=hit,
        inside=inside,
        pp=sel(push_pp, pop_pp, s.pp, s.pp),
        idx=sel(push_idx, pop_idx, adv_idx, s.idx),
        scale=sel(push_scale, pop_scale, s.scale, s.scale),
        posx=sel(push_posx, pop_posx, adv_posx, s.posx),
        posy=sel(push_posy, pop_posy, adv_posy, s.posy),
        posz=sel(push_posz, pop_posz, adv_posz, s.posz),
        t_min=jnp.where(advance, tc_max, s.t_min),
        t_max=sel(tv_max, pop_t_max, s.t_max, s.t_max),
        adj_last=adj_last,
        missed=missed,
        suppress=suppress,
        desc=jnp.where(do_pop, pop_desc,
                       jnp.where(fetch_free, desc_c, s.desc)),
        child_ptr=jnp.where(do_pop, pop_cptr, s.child_ptr),
        need_fetch=s.need_fetch | (want_push & ~fetch_free),
        stack_desc=stack_desc,
        stack_cptr=stack_cptr,
        pend_slot=pend_slot,
        pend_desc=pend_desc,
        pend_cptr=pend_cptr,
        floor=s.floor,
        c0=s.c0, c1=s.c1, c2=s.c2, c3=s.c3, c_owner=s.c_owner,
    )


def run_loop_push(fat_rows, c: RayConsts, state: PushState, max_iters: int,
                  substeps: int, opaque: bool = False
                  ) -> tuple[jnp.ndarray, PushState]:
    """Iterate (fetch, SUBSTEPS x substep) until all rays retire."""

    def cond(carry):
        it, s = carry
        return (it < max_iters) & jnp.any(s.active)

    def body(carry):
        it, s = carry
        s = fetch_phase(fat_rows, s)
        for _ in range(substeps):
            s = substep(c, s, opaque)
        return it + 1, s

    return jax.lax.while_loop(cond, body, (jnp.int32(0), state))


def run_loop(rows, c: RayConsts, state: State, max_steps: int, unroll: int,
             cast_translucent: bool, alpha_fn) -> tuple[jnp.ndarray, State]:
    def cond(carry):
        it, s = carry
        return (it < max_steps) & jnp.any(s.active)

    def body(carry):
        it, s = carry
        for _ in range(unroll):
            s = traversal_step(rows, c, s, cast_translucent, alpha_fn)
        return it + unroll, s

    return jax.lax.while_loop(cond, body, (jnp.int32(0), state))


def finalize(fat_rows, c: RayConsts, state: State, steps_used,
             value_override=None) -> TraversalResult:
    """Recompute the full hit record from frozen per-ray state (one pass).
    ``fat_rows`` is the (N/108, 108) buffer view (``_make_fat_rows``).
    ``value_override``: (B,) u32 carried leaf values — skips the per-lane
    value fetch (finalize becomes fetch-free)."""
    B = state.active.shape[0]
    leaf_value, face_id, ux, uy, dst, tex_lod, (upx, upy, upz) = hit_phase_fat(
        fat_rows, c, state.pp, state.idx, state.scale, state.posx, state.posy,
        state.posz, state.t_min,
        child_ptr=getattr(state, "child_ptr", None),
        value_override=value_override,
    )
    scale_exp2 = _exp2_scale(state.scale)
    hit = state.hit

    hx = jnp.clip(c.rox + state.t_min * c.rdx, upx + EPSILON, upx + scale_exp2 - EPSILON)
    hy = jnp.clip(c.roy + state.t_min * c.rdy, upy + EPSILON, upy + scale_exp2 - EPSILON)
    hz = jnp.clip(c.roz + state.t_min * c.rdz, upz + EPSILON, upz + scale_exp2 - EPSILON)
    hit_pos = (jnp.stack([hx, hy, hz], -1) - 1.0) / c.octree_scale

    return TraversalResult(
        t=jnp.where(hit, dst, -1.0).astype(f32),
        value=jnp.where(hit, leaf_value, 0).astype(u32),
        face_id=jnp.where(hit, face_id, 0).astype(i32),
        pos=jnp.where(hit[:, None], hit_pos, 0.0).astype(f32),
        uv=jnp.where(hit[:, None], jnp.stack([ux, uy], -1), 0.0).astype(f32),
        lod=jnp.where(hit, tex_lod, 0.0).astype(f32),
        inside_voxel=state.inside,
        steps=jnp.broadcast_to(steps_used, (B,)),
        trace=None,
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
      descriptors: (N,) uint32 SVO buffer (preamble block at word 0).
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
    rows = _make_rows(descriptors)
    if row_pad > 12:
        rows = jnp.pad(rows, ((0, 0), (0, row_pad - 12)))
    c = make_ray_consts(octree_scale, ro, rd, max_dst)

    fat_rows = _make_fat_rows(descriptors)

    if record_trace:
        return _traced_traversal(rows, fat_rows, c, init_state(c), max_steps,
                                 cast_translucent, alpha_fn)

    if cast_translucent and alpha_fn is not None:
        # in-loop alpha judging needs texture reads every step: classic loop
        state = init_state(c)
        steps_used, state = run_loop(
            rows, c, state, max_steps, unroll, cast_translucent, alpha_fn
        )
        return finalize(fat_rows, c, state, steps_used)

    # opaque: push-driven engine (fetch only on PUSH)
    pstate = init_state_push(c)
    iters, pstate = run_loop_push(fat_rows, c, pstate, max_steps, 3,
                                  opaque=True)
    return finalize(fat_rows, c, pstate, iters)


def intersect_octree_deferred(
    descriptors: jnp.ndarray,
    octree_scale,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    max_dst,
    alpha_fn: Callable,
    max_steps: int = MAX_STEPS,
    unroll: int = 4,
    rounds: int = 8,
):
    """Translucent casting at picker cost: the loop stops at every leaf hit
    (one gather per step); texel alpha and adjacent-same-leaf skipping are
    judged *between* rounds, and rejected lanes resume with their state.

    Behavioral difference vs the in-loop reference semantics: rays that pass
    through more than ``rounds`` translucent texels are reported as misses
    (the reference bounds the same rays by MAX_STEPS instead). Returns the
    same TraversalResult.
    """
    rows = _make_rows(descriptors)
    fat_rows = _make_fat_rows(descriptors)
    c = make_ray_consts(octree_scale, ro, rd, max_dst)
    state = init_state_push(c)
    B = ro.shape[0]

    done = jnp.zeros(B, bool)
    acc_t = jnp.full(B, -1.0, f32)
    acc_value = jnp.zeros(B, u32)
    acc_face = jnp.zeros(B, i32)
    acc_pos = jnp.zeros((B, 3), f32)
    acc_uv = jnp.zeros((B, 2), f32)
    acc_lod = jnp.zeros(B, f32)
    steps_total = jnp.int32(0)

    for _ in range(rounds):
        steps, state = run_loop_push(fat_rows, c, state, max_steps, 3)
        steps_total = steps_total + steps

        res = finalize(fat_rows, c, state, steps_total)
        adj_count = (state.adj_last >> 24).astype(i32)
        last_value = state.adj_last & _NO_VALUE
        # a miss step since the previous leaf resets adjacency (glsl:313-317)
        adj_count = jnp.where(state.missed, 0, adj_count)
        last_value = jnp.where(state.missed, _NO_VALUE, last_value)

        judge = state.hit & ~done
        alpha = alpha_fn(res.value, res.face_id, res.uv, res.lod)
        first_of_kind = (adj_count == 0) | ((res.value & _NO_VALUE) != last_value)
        accept = judge & (alpha > 0) & first_of_kind
        resume = judge & ~accept

        acc_t = jnp.where(accept, res.t, acc_t)
        acc_value = jnp.where(accept, res.value, acc_value)
        acc_face = jnp.where(accept, res.face_id, acc_face)
        acc_pos = jnp.where(accept[:, None], res.pos, acc_pos)
        acc_uv = jnp.where(accept[:, None], res.uv, acc_uv)
        acc_lod = jnp.where(accept, res.lod, acc_lod)
        done = done | accept

        # resume pass-through lanes: count the adjacency, skip this leaf once
        adj_count = jnp.where(resume, jnp.minimum(adj_count + 1, 255), adj_count)
        last_value = jnp.where(resume, res.value & _NO_VALUE, last_value)
        state = state._replace(
            active=state.active | resume,
            hit=state.hit & ~resume,
            adj_last=(adj_count.astype(u32) << 24) | last_value,
            missed=jnp.zeros(B, bool),
            suppress=resume,
            floor=jnp.where(resume, state.t_min, state.floor),
        )

    return TraversalResult(
        t=acc_t,
        value=acc_value,
        face_id=acc_face,
        pos=acc_pos,
        uv=acc_uv,
        lod=acc_lod,
        inside_voxel=state.inside,
        steps=jnp.broadcast_to(steps_total, (B,)),
        trace=None,
    )


def _traced_traversal(rows, fat_rows, c: RayConsts, state0: State, max_steps,
                      cast_translucent, alpha_fn):
    """Slow trace-recording path for step-trace tests: record
    (t, ptr, octant_idx, parent_idx, scale, is_child, is_leaf) per step."""
    B = state0.active.shape[0]
    trace_t = jnp.full((B, max_steps), -1.0, f32)
    trace_i = jnp.full((B, max_steps, 7), -1, i32)
    trace_n = jnp.zeros(B, i32)

    def body(carry):
        it, s, trace_t, trace_i, trace_n = carry
        active = s.active
        ptr = s.pp & PTR_MASK
        pidx = (s.pp >> PTR_BITS).astype(i32)
        octant_idx = (s.idx ^ c.octant_mask).astype(u32)
        bit = (jnp.uint32(1) << octant_idx).astype(u32)
        descriptor = _row_word(_gather_row(rows, ptr), pidx // 2)
        descriptor = jnp.where(pidx % 2 != 0, descriptor >> jnp.uint32(16), descriptor)
        is_child = (descriptor & (bit << jnp.uint32(8))) != 0
        is_leaf = (descriptor & bit) != 0

        nc = jnp.clip(trace_n, 0, max_steps - 1)
        lanes = jnp.arange(B)
        row = jnp.stack(
            [ptr.astype(i32), octant_idx.astype(i32), pidx, s.scale,
             is_child.astype(i32), is_leaf.astype(i32), jnp.zeros(B, i32)],
            axis=-1,
        )
        trace_t = trace_t.at[lanes, nc].set(
            jnp.where(active, s.t_min / c.octree_scale, trace_t[lanes, nc])
        )
        trace_i = trace_i.at[lanes, nc].set(
            jnp.where(active[:, None], row, trace_i[lanes, nc])
        )
        trace_n = trace_n + active.astype(i32)

        s = traversal_step(rows, c, s, cast_translucent, alpha_fn)
        return it + 1, s, trace_t, trace_i, trace_n

    def cond(carry):
        return (carry[0] < max_steps) & jnp.any(carry[1].active)

    it, state, trace_t, trace_i, trace_n = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state0, trace_t, trace_i, trace_n)
    )
    res = finalize(fat_rows, c, state, it)
    return res._replace(trace={
        "t": trace_t,
        "ptr": trace_i[..., 0],
        "idx": trace_i[..., 1],
        "parent_idx": trace_i[..., 2],
        "scale": trace_i[..., 3],
        "is_child": trace_i[..., 4],
        "is_leaf": trace_i[..., 5],
        "n": trace_n,
    })
