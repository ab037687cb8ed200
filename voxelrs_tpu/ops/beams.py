"""Beam pre-pass: conservative per-tile ray-entry floors from the terrain
envelope (world/heightfield.py).

One beam per 8x8 pixel tile marches the 2D column-top envelope (a
max-pyramid DDA, the "maximum mipmaps" heightfield scheme) instead of the
full SVO and returns, per tile, a distance t_floor such that NO ray of the
tile can hit geometry before t_floor — or +inf when the whole tile
provably misses everything (sky). The main trace then starts every pixel
ray at its tile's floor via the engines' ``start_floored`` (a bit-exact
restart, ops/traversal.py), skipping the air-walk iterations that dominate
terrain frames, and drops certain-miss lanes before the first round.

Soundness argument (checked by tests/test_beams.py):
- every tile ray stays within angle θ of the tile's center beam, so at
  parameter t it deviates at most t·sinθ from the beam point, both
  vertically and horizontally;
- vertical deviation is subtracted explicitly (the y-margin);
- horizontal deviation up to one column (8 voxels) is absorbed by testing
  the 3x3-max dilated envelope, so beam claims are valid for
  t ≤ T8 = (8 - slack)/sinθ; floors and miss verdicts are clamped to T8;
- the near field (a 5x5-column box around the camera, exited at t_start)
  is excluded from the march and covered instead by per-tile slab tests
  of the center ray against each near column's exact bounding box,
  inflated by 1 voxel (near deviation is ≤ 0.3 voxel);
- a ray climbing faster than sinθ whose margin-lowered height exceeds the
  global envelope maximum can never come back down: certain miss.

No reference counterpart — the reference traces all rays from the root
(src/graphics/svo.rs); this pass exists because TPU frame cost is gather
-bound and floors cut gathers/ray ~2-3x on terrain scenes (docs/PERF.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .smalltab import small_lookup

f32 = jnp.float32
i32 = jnp.int32

CELL = 8.0  # envelope column footprint in voxels (world/heightfield.py)
_EPS_DIR = np.float32(2.0**-23)
_Y_SLACK = np.float32(0.75)  # absorbs DDA step nudges + fp rounding
_T_SLACK = np.float32(0.01)


def _envelope_march(levels, offsets, n, hmax, rox, roy, roz, dx, dy, dz,
                    inv_x, inv_z, sin_t, m0, t_start, t_hard, max_iters):
    """Shared max-pyramid 2D march over the dilated envelope.

    Tests the margin-lowered ray height y_lo(t) = roy + t*(dy - sin_t) - m0
    (linear in t) against per-cell envelope maxima, descending the pyramid
    near threats. Origins and margins are per-lane (beams share nothing).
    Returns the per-lane conservative stop distance: +inf when the march
    proves no envelope threat up to t_hard; a mid-march t when the
    iteration budget ran out (still a valid floor)."""
    B = dx.shape[0]
    offs = jnp.asarray(np.asarray(offsets, np.int32))
    max_lvl = len(offsets) - 1
    slope = dy - sin_t

    def body(carry):
        it, t, lvl, stop_t, done = carry
        live = ~done
        s = CELL * jnp.exp2(lvl.astype(f32))  # cell size in voxels
        px = rox + t * dx
        pz = roz + t * dz
        cx = jnp.floor(px / s)
        cz = jnp.floor(pz / s)
        nl = (n >> lvl).astype(i32)
        cxi = jnp.clip(cx.astype(i32), 0, nl - 1)
        czi = jnp.clip(cz.astype(i32), 0, nl - 1)
        # level offset via one-hot (a per-lane gather costs ~4.1 ms/M
        # lanes even on this tiny table); the pyramid read stays a gather
        hv = levels[small_lookup(offs, lvl) + cxi * nl + czi].astype(f32)
        # exit of the (virtual, unclamped) cell in xz
        bx = (cx + (dx > 0)) * s
        bz = (cz + (dz > 0)) * s
        t_exit = jnp.minimum((bx - rox) * inv_x, (bz - roz) * inv_z)
        t_exit = jnp.minimum(jnp.maximum(t_exit, t), t_hard)
        # y_lo is LINEAR in t: its span minimum sits at the end slope picks
        y_lo = roy + jnp.where(slope >= 0, t, t_exit) * slope - m0
        hit = y_lo <= hv
        stop = live & hit & (lvl == 0)
        descend = live & hit & (lvl > 0)
        advance = live & ~hit
        # floor refinement: the threat starts where y_lo(t) crosses hv, not
        # at the cell's xz entry — the honest floor for steep descents
        t_y = (roy - m0 - hv) / jnp.maximum(-slope, _EPS_DIR)
        stop_val = jnp.where(slope >= 0, t, jnp.maximum(t, t_y))
        stop_t = jnp.where(stop, stop_val, stop_t)
        t_next = t_exit * (1.0 + 2.0**-21) + 2.0**-16
        t = jnp.where(advance, t_next, t)
        lvl = jnp.where(descend, lvl - 1,
                        jnp.where(advance, jnp.minimum(lvl + 1, max_lvl),
                                  lvl))
        rising = (slope > 0) & (roy + t * slope - m0 > hmax)
        done = done | stop | (advance & ((t >= t_hard) | rising))
        return it + 1, t, lvl, stop_t, done

    def cond(carry):
        it, _t, _l, _s, done = carry
        return (it < max_iters) & ~jnp.all(done)

    t0 = jnp.broadcast_to(t_start, (B,))
    lvl0 = jnp.full(B, max_lvl, i32)
    stop0 = jnp.full(B, jnp.inf, f32)
    done0 = (t0 >= t_hard) | ((slope > 0) & (roy + t0 * slope - m0 > hmax))
    _it, t_f, _lvl, stop_t, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, lvl0, stop0, done0))

    stopped = jnp.isfinite(stop_t)
    exhausted = ~done & ~stopped  # ran out of iterations mid-march
    return jnp.where(stopped, stop_t, jnp.where(exhausted, t_f, jnp.inf))


def _dir_for(px, py, width, height, right, up, fwd, fov_y_rad, aspect):
    """Pixel-grid direction exactly as ops/shading.generate_rays maps
    integer pixel coords (px may be fractional for tile centers)."""
    u = (px / width * 2.0 - 1.0) * aspect * jnp.tan(fov_y_rad * 0.5)
    v = ((height - 1.0 - py) / height * 2.0 - 1.0) * jnp.tan(fov_y_rad * 0.5)
    d = u[..., None] * right + v[..., None] * up + fwd
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile", "n", "offsets", "max_iters",
    ),
)
def tile_floors(
    levels,            # (R,) int32 concatenated dilated max-pyramid
    offsets,           # static tuple: level start offsets into ``levels``
    n,                 # static: level-0 columns per axis
    hmax,              # f32 scalar: global envelope max
    bounds,            # (4,) f32: occupied extent (x0, x1, z0, z1) voxels
    near_h,            # (5,5) f32: EXACT envelope window around the camera
    near_base,         # (2,) f32: column coords (x,z) of near_h[0,0]
    cam_pos,           # (3,) f32 voxels (SVO space)
    cam_right, cam_up, cam_fwd,
    fov_y_rad, aspect,
    max_dst,           # f32 scalar, <0 = unbounded
    *, width: int, height: int, tile: int = 8, max_iters: int = 96,
):
    """Per-tile conservative entry floors, (nty, ntx) f32; +inf = the whole
    tile certainly misses all geometry."""
    ntx = -(-width // tile)
    nty = -(-height // tile)
    tx = jnp.arange(ntx, dtype=f32)
    ty = jnp.arange(nty, dtype=f32)
    x0 = tx * tile
    x1 = jnp.minimum(x0 + (tile - 1), width - 1)
    y0 = ty * tile
    y1 = jnp.minimum(y0 + (tile - 1), height - 1)
    gx0, gy0 = jnp.meshgrid(x0, y0)  # (nty, ntx)
    gx1, gy1 = jnp.meshgrid(x1, y1)

    args = (width, height, cam_right, cam_up, cam_fwd, fov_y_rad, aspect)
    d_c = _dir_for((gx0 + gx1) * 0.5, (gy0 + gy1) * 0.5, *args)
    # cone half-angle: min cosine against the 4 extreme (corner) pixel rays
    cos_t = jnp.full(d_c.shape[:2], 1.0, f32)
    for cx in (gx0, gx1):
        for cy in (gy0, gy1):
            cos_t = jnp.minimum(cos_t, jnp.sum(_dir_for(cx, cy, *args) * d_c, -1))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0)) + 1e-4

    B = ntx * nty
    d = d_c.reshape(B, 3)
    sin_t = sin_t.reshape(B)
    ro = cam_pos.astype(f32)

    dx = jnp.where(jnp.abs(d[:, 0]) < _EPS_DIR,
                   jnp.where(d[:, 0] < 0, -_EPS_DIR, _EPS_DIR), d[:, 0])
    dy = d[:, 1]
    dz = jnp.where(jnp.abs(d[:, 2]) < _EPS_DIR,
                   jnp.where(d[:, 2] < 0, -_EPS_DIR, _EPS_DIR), d[:, 2])
    inv_x, inv_z = 1.0 / dx, 1.0 / dz

    # -- per-tile hard stop: exit of the OCCUPIED envelope box ------------
    # All geometry sits inside bounds x [0, hmax]; a tile ray's hit at t'
    # puts the center beam inside the deviation-padded box, so the center's
    # padded-box exit bounds every tile ray's last possible hit. Sky beams
    # leave the box quickly -> small t_hard -> certain-miss elision.
    far = jnp.float32(0.0)
    for cxv in (bounds[0], bounds[1]):
        for cyv in (0.0, 1.0):
            for czv in (bounds[2], bounds[3]):
                corner = jnp.stack([cxv, cyv * (hmax + 1.0), czv])
                far = jnp.maximum(far, jnp.linalg.norm(corner - ro))
    dy_safe0 = jnp.where(jnp.abs(d[:, 1]) < _EPS_DIR, _EPS_DIR, d[:, 1])
    pad_box = sin_t * far + 2.0  # (B,)
    txa_h = (bounds[0] - pad_box - ro[0]) * inv_x
    txb_h = (bounds[1] + pad_box - ro[0]) * inv_x
    tya_h = (-pad_box - ro[1]) / dy_safe0
    tyb_h = (hmax + pad_box - ro[1]) / dy_safe0
    tza_h = (bounds[2] - pad_box - ro[2]) * inv_z
    tzb_h = (bounds[3] + pad_box - ro[2]) * inv_z
    t_entry_box = jnp.maximum(jnp.maximum(jnp.minimum(txa_h, txb_h),
                                          jnp.minimum(tya_h, tyb_h)),
                              jnp.minimum(tza_h, tzb_h))
    t_exit_box = jnp.minimum(jnp.minimum(jnp.maximum(txa_h, txb_h),
                                         jnp.maximum(tya_h, tyb_h)),
                             jnp.maximum(tza_h, tzb_h))
    t_hard = jnp.where(t_exit_box >= jnp.maximum(t_entry_box, 0.0),
                       jnp.maximum(t_exit_box, 0.0), 0.0)
    t_hard = jnp.where(max_dst >= 0.0, jnp.minimum(max_dst, t_hard), t_hard)

    # -- near field: 5x5 exact column boxes, slab-tested per tile ---------
    # Tile rays deviate from the center beam by up to t*sin(theta); a point
    # inside the near region is at most d_far (box far-corner distance)
    # away, so inflating each box by sin_t*d_far + 1 makes the CENTER slab
    # test conservative for every tile ray.
    ccx = near_base[0]
    ccz = near_base[1]
    nbx0 = ccx * CELL
    nbz0 = ccz * CELL
    h_top = jnp.max(near_h) + 1.0
    d_far = jnp.float32(0.0)
    for cxv in (nbx0, nbx0 + 5 * CELL):
        for cyv in (0.0, None):
            for czv in (nbz0, nbz0 + 5 * CELL):
                y = h_top if cyv is None else cyv
                corner = jnp.stack([cxv, y, czv])
                d_far = jnp.maximum(d_far, jnp.linalg.norm(corner - ro))
    pad = sin_t * d_far + 1.0  # (B,)
    dy_safe = jnp.where(jnp.abs(dy) < _EPS_DIR, _EPS_DIR, dy)
    t_near = jnp.full(B, jnp.inf, f32)
    for ix in range(5):
        for iz in range(5):
            h = near_h[ix, iz]
            bx0 = (ccx + ix) * CELL
            bz0 = (ccz + iz) * CELL
            txa = (bx0 - pad - ro[0]) * inv_x
            txb = (bx0 + CELL + pad - ro[0]) * inv_x
            tya = (-pad - ro[1]) / dy_safe
            tyb = (h + pad - ro[1]) / dy_safe
            tza = (bz0 - pad - ro[2]) * inv_z
            tzb = (bz0 + CELL + pad - ro[2]) * inv_z
            t_in = jnp.maximum(jnp.maximum(jnp.minimum(txa, txb),
                                           jnp.minimum(tya, tyb)),
                               jnp.minimum(tza, tzb))
            t_out = jnp.minimum(jnp.minimum(jnp.maximum(txa, txb),
                                            jnp.maximum(tya, tyb)),
                                jnp.maximum(tza, tzb))
            hit = (t_out >= jnp.maximum(t_in, 0.0)) & (h > 0.0)
            t_near = jnp.where(
                hit, jnp.minimum(t_near, jnp.maximum(t_in, 0.0)), t_near)

    # -- DDA start: near-box exit, backed up by the deviation -------------
    # Tile rays can leave the near box (in their own parameter) up to
    # dev/|d_xz| before the center does; starting that much earlier closes
    # the gap — hits before t0 are then strictly inside the near box and
    # covered by the padded near tests above.
    tx_far = (jnp.where(dx > 0, nbx0 + 5 * CELL, nbx0) - ro[0]) * inv_x
    tz_far = (jnp.where(dz > 0, nbz0 + 5 * CELL, nbz0) - ro[2]) * inv_z
    t_box = jnp.maximum(jnp.minimum(tx_far, tz_far), 0.0)
    d_xz = jnp.sqrt(dx * dx + dz * dz)
    backup = (sin_t * t_box + 2.0) / jnp.maximum(d_xz, _EPS_DIR)
    t_start = jnp.maximum(t_box - backup, 0.0)

    # -- max-pyramid DDA over the dilated envelope ------------------------
    beam = _envelope_march(
        levels, offsets, n, hmax, ro[0], ro[1], ro[2], dx, dy, dz,
        inv_x, inv_z, sin_t, jnp.full(B, _Y_SLACK, f32), t_start, t_hard,
        max_iters,
    )
    # horizontal-deviation validity: the 1-column dilation covers
    # t*sin(theta) <= CELL - slack
    t8 = (CELL - 1.0) / sin_t
    beam = jnp.where(
        jnp.isinf(beam) & (t_hard <= t8), beam, jnp.minimum(beam, t8))

    floors = jnp.minimum(beam, t_near)
    floors = jnp.where(
        jnp.isfinite(floors),
        jnp.maximum(floors * (1.0 - 2.0**-18) - _T_SLACK, 0.0),
        floors,
    )
    return floors.reshape(nty, ntx)


@partial(jax.jit, static_argnames=("width", "height", "tile"))
def pixel_floors(tf, *, width: int, height: int, tile: int = 8):
    """Broadcast (nty, ntx) tile floors to a flat (H*W,) pixel array in the
    image's row-major lane order."""
    up = jnp.repeat(jnp.repeat(tf, tile, axis=0), tile, axis=1)
    return up[:height, :width].reshape(-1)


# -- per-ray shadow floors ---------------------------------------------------
# A shadow ray is a single line (no cone), so its envelope march needs no
# deviation margin at all and runs over the EXACT pyramid. The subtlety is
# the origin: it sits ON the geometry surface, where any slack-based test
# trips immediately. Per-ray gate: if the origin is at-or-above the 3x3-max
# (dilated) envelope of its own column, nothing within one column can rise
# above a ray that climbs toward the sun — integer voxel tops make this
# exact — so the march may start at the ring exit. Gated-out rays (side
# -face hits below a local top, i.e. exactly the maybe-self-shadowed
# geometry) keep floor 0 and trace normally.


@partial(jax.jit, static_argnames=("n", "offsets", "max_iters"))
def shadow_ray_floors(
    levels_e,          # (R,) i32 EXACT max-pyramid (heightfield.device[5])
    h3d0,              # (n*n,) i32 DILATED level 0 (3x3 max of exact)
    offsets, n, hmax, bounds,
    ro,                # (k,3) shadow-ray origins (voxels, offset off the
                       # surface by shading's 1e-3 normal push)
    light_to,          # (3,) shadow-ray direction (toward the light)
    max_dst,           # (k,) per-ray limit, <0 = unbounded
    *, max_iters: int = 48,
):
    """(k,) conservative per-ray shadow floors: +inf = the ray certainly
    reaches the light (skip the trace), 0 = no claim."""
    k = ro.shape[0]
    d = light_to.astype(f32)
    dx = jnp.where(jnp.abs(d[0]) < _EPS_DIR,
                   jnp.where(d[0] < 0, -_EPS_DIR, _EPS_DIR), d[0])
    dy = d[1]
    dz = jnp.where(jnp.abs(d[2]) < _EPS_DIR,
                   jnp.where(d[2] < 0, -_EPS_DIR, _EPS_DIR), d[2])
    inv_x, inv_z = 1.0 / dx, 1.0 / dz
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]

    ccx = jnp.clip(jnp.floor(rox / CELL).astype(i32), 0, n - 1)
    ccz = jnp.clip(jnp.floor(roz / CELL).astype(i32), 0, n - 1)
    near = h3d0[ccx * n + ccz].astype(f32)
    # 1e-4 < the 1e-3 surface offset: a top-face origin reads exactly its
    # column top after rounding, and nothing can be hit within the offset
    gate = (dy >= 0.2) & (roy >= near - 1e-4)

    # the gate covers at least one full column of horizontal travel
    d_xz = jnp.sqrt(dx * dx + dz * dz)
    t_ring = CELL / jnp.maximum(d_xz, _EPS_DIR)

    # hard stop: exit of the (lightly padded) occupied box
    dy_safe = jnp.where(jnp.abs(dy) < _EPS_DIR, _EPS_DIR, dy)
    txa = (bounds[0] - 1.0 - rox) * inv_x
    txb = (bounds[1] + 1.0 - rox) * inv_x
    tya = (-1.0 - roy) / dy_safe
    tyb = (hmax + 1.0 - roy) / dy_safe
    tza = (bounds[2] - 1.0 - roz) * inv_z
    tzb = (bounds[3] + 1.0 - roz) * inv_z
    t_entry = jnp.maximum(jnp.maximum(jnp.minimum(txa, txb),
                                      jnp.minimum(tya, tyb)),
                          jnp.minimum(tza, tzb))
    t_exit = jnp.minimum(jnp.minimum(jnp.maximum(txa, txb),
                                     jnp.maximum(tya, tyb)),
                         jnp.maximum(tza, tzb))
    t_hard = jnp.where(t_exit >= jnp.maximum(t_entry, 0.0),
                       jnp.maximum(t_exit, 0.0), 0.0)
    t_hard = jnp.where(max_dst >= 0.0,
                       jnp.minimum(t_hard, max_dst + 1.0), t_hard)

    beam = _envelope_march(
        levels_e, offsets, n, hmax,
        rox, roy, roz,
        jnp.broadcast_to(dx, (k,)), jnp.broadcast_to(dy, (k,)),
        jnp.broadcast_to(dz, (k,)),
        jnp.broadcast_to(inv_x, (k,)), jnp.broadcast_to(inv_z, (k,)),
        jnp.zeros(k, f32), jnp.full(k, 0.05, f32), t_ring, t_hard,
        max_iters,
    )
    floors = jnp.where(
        jnp.isfinite(beam),
        jnp.maximum(beam * (1.0 - 2.0**-18) - _T_SLACK, 0.0),
        beam,
    )
    return jnp.where(gate, floors, 0.0)


@partial(jax.jit, static_argnames=("n1",))
def sun_verdict_masks(sb_map, n1, ro, max_dst, d_len, d, origin):
    """(lit, blocked) bool masks from the precomputed per-voxel sun
    certificates (world/heightfield.py sun_map). One row gather per ray;
    row = [S_far, 25 near voxel tops, 25 near run tops, 25 near run
    bottoms, K band los, K band his], u16 quarter-voxel fixed point
    (value = raw * 0.25 - 1, conservative per-plane rounding). ``origin``
    is the window's (x, z) voxel offset: rays originating outside the
    n1-wide window get no claims and simply trace.

    ``lit`` — the ray certainly reaches the light: it clears the far
    field (y >= S_far, a dense conservative sweep over crossings >= 3
    columns out) AND, per EXACT window tests against the 5x5 neighbor
    columns from the origin's true position, stays at-or-above every
    near column's voxel top while over it (column-top model: solid up to
    the top — only over-shades).

    ``blocked`` — the ray certainly hits opaque solid: either an exact
    near window pierces a neighbor column's topmost contiguous-opaque
    run >= 1 voxel deep (step shadows), or the origin's height falls in
    a distance-ladder band (a downstream skin crossing, gated on the ray
    being allowed to travel ``d_len``)."""
    W = sb_map.shape[1]
    K = (W - 76) // 2
    rox = ro[:, 0] - origin[0]  # window coords (exact: origin is a
    roz = ro[:, 2] - origin[1]  # 32-aligned integer within f32 range)
    cx = jnp.floor(rox)
    cz = jnp.floor(roz)
    # tolerance band: shadow origins on boundary faces sit a normal
    # offset (0.001) outside the window; their window tests run against
    # the CLAMPED cell's row (planes stay aligned), and the <=0.125
    # deviation stays inside the far sweep's 3x3-dilation and the band
    # ladder's +-1 deviation budgets
    inw = ((rox >= -0.125) & (rox < n1 + 0.125)
           & (roz >= -0.125) & (roz < n1 + 0.125))
    ccx = jnp.clip(cx, 0.0, float(n1 - 1))
    ccz = jnp.clip(cz, 0.0, float(n1 - 1))
    ci = ccx.astype(i32) * n1 + ccz.astype(i32)
    row = sb_map[ci].astype(f32) * 0.25 - 1.0  # (k, W) decoded
    y = ro[:, 1]

    dx = jnp.where(jnp.abs(d[0]) < _EPS_DIR,
                   jnp.where(d[0] < 0, -_EPS_DIR, _EPS_DIR), d[0])
    dy = d[1]  # >= 0.1 (heightfield gates the map on sun elevation)
    dz = jnp.where(jnp.abs(d[2]) < _EPS_DIR,
                   jnp.where(d[2] < 0, -_EPS_DIR, _EPS_DIR), d[2])
    inv_x, inv_z = 1.0 / dx, 1.0 / dz

    lit = y + 1e-4 >= row[:, 0]
    blk = jnp.zeros(ro.shape[0], bool)
    i = 0
    for ddx in (-2, -1, 0, 1, 2):
        for ddz in (-2, -1, 0, 1, 2):
            h = row[:, 1 + i]
            bt = row[:, 26 + i]
            bb = row[:, 51 + i]
            x0 = ccx + ddx  # windows around the CLAMPED cell: the row's
            z0 = ccz + ddz  # near planes are for those columns
            txa = (x0 - rox) * inv_x
            txb = (x0 + 1.0 - rox) * inv_x
            tza = (z0 - roz) * inv_z
            tzb = (z0 + 1.0 - roz) * inv_z
            t_in = jnp.maximum(jnp.minimum(txa, txb), jnp.minimum(tza, tzb))
            t_out = jnp.minimum(jnp.maximum(txa, txb),
                                jnp.maximum(tza, tzb))
            t_lo = jnp.maximum(t_in, 0.0)
            over = t_out > t_lo
            h_at = y + t_lo * dy  # rising ray: window minimum height
            # conservative margin, scaled with t_lo: window math is exact
            # at t_lo=0 (top-face origins sit 0.001 above their own top
            # and must keep their claim) but accrues float32 error with
            # distance, and a ray whose true entry height is a hair below
            # the top grazes the voxel corner for a t-span the trace
            # resolves — borderline lanes must fall back to tracing
            lit = lit & ~(over & (h_at < h + 5e-4 + 1e-3 * t_lo))
            # first moment the ray is >= bb+1 inside the window; a hit is
            # certain if that moment exists and still sits <= bt-1
            t_c = jnp.maximum(t_lo, (bb + 1.0 - y) / dy)
            h_c = y + t_c * dy
            # t_c must sit clearly inside the window: within ~1e-3 float
            # error of t_out the true crossing may graze past the column
            hit = (over & (bt > 0.5) & (t_c < t_out - 1e-2)
                   & (h_c <= bt - 1.0))
            hit = hit & ((max_dst < 0) | (t_c <= max_dst - 1.0))
            blk = blk | hit
            i += 1
    for j in range(K):
        band = ((y >= row[:, 76 + j] + 1e-4)
                & (y <= row[:, 76 + K + j] - 1e-4))
        band = band & ((max_dst < 0) | (max_dst >= d_len))
        blk = blk | band
    return lit & inw, blk & inw & ~lit


@partial(jax.jit, static_argnames=("n1",))
def sun_lit_floors(sb_map, n1, ro, max_dst, d_len, d, origin):
    """(k,) shadow floors (+inf = certainly lit, 0 = trace normally) —
    the floor-shaped lit-only view for callers without lane compaction."""
    lit, _blk = sun_verdict_masks(sb_map, n1=n1, ro=ro, max_dst=max_dst,
                                  d_len=d_len, d=d, origin=origin)
    return jnp.where(lit, jnp.inf, 0.0).astype(f32)


@jax.tree_util.register_pytree_node_class
class BeamContext:
    """Per-frame pre-pass handle handed to the frame drivers: the primary
    pixel floors plus the device envelope state needed to floor shadow
    rays once their origins exist (graphics/svo.py constructs one per
    frame when a heightfield is attached)."""

    def __init__(self, t_floor, dev, width: int, height: int, sun=None):
        self.t_floor = t_floor
        self._dev = dev  # heightfield.device() tuple
        # (sb_map (n1*n1, 76+2K) u16, n1, d_len, d, origin) or None
        self._sun = sun

    def tree_flatten(self):
        """Pytree support: the fused whole-frame program takes the beam
        context as a jit ARGUMENT, so its device arrays stay call inputs
        (a closure capture would bake them into the compiled program as
        constants and recompile on every sun-map/envelope refresh)."""
        dev = self._dev
        sun_leaves = None if self._sun is None else (
            self._sun[0], self._sun[2], self._sun[3], self._sun[4])
        leaves = (self.t_floor, dev[0], dev[4], dev[5], sun_leaves)
        aux = (dev[1], dev[2], dev[3],
               None if self._sun is None else self._sun[1])
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        offsets, n, hmax, n1 = aux
        t_floor, lv_d, bounds, lv_e, sun_leaves = leaves
        b = cls.__new__(cls)
        b.t_floor = t_floor
        b._dev = (lv_d, offsets, n, hmax, bounds, lv_e)
        b._sun = None if sun_leaves is None else (
            sun_leaves[0], n1, sun_leaves[1], sun_leaves[2], sun_leaves[3])
        return b

    def has_sun(self) -> bool:
        """Whether per-voxel sun certificates are attached (the frame
        drivers then certify shadow lanes on the candidate buckets)."""
        return self._sun is not None

    def sun_verdicts(self, ro, max_dst):
        """(lit, blocked) bool masks — origins the sun map proves see /
        don't see the light — or None when no sun map is attached. The
        frame drivers evaluate this on COMPACTED candidate-lane buckets
        (one row gather per candidate lane; never at full frame width —
        the certified verdicts equal what tracing would return, so output
        is bit-identical) — vs t_floor elision, which only drops lanes at
        the trace's first compaction."""
        if self._sun is None:
            return None
        sb_map, n1, d_len, d, origin = self._sun
        return sun_verdict_masks(sb_map, n1=n1, ro=ro, max_dst=max_dst,
                                 d_len=d_len, d=d, origin=origin)

    def shadow_ray_floors(self, ro, max_dst, direction,
                          prefer_envelope: bool = False):
        """(k,) conservative floors for shadow rays from origins ``ro``
        along the constant ``direction`` (toward the light). Prefers the
        per-voxel sun map (exact on slopes and side faces); falls back to
        the envelope march (effective on flat ground only).
        ``prefer_envelope`` forces the envelope path — used while the
        just-attached sun map's programs are still warming in the
        background (the envelope shapes are already compiled)."""
        if self._sun is not None and not prefer_envelope:
            sb_map, n1, d_len, d, origin = self._sun
            return sun_lit_floors(sb_map, n1=n1, ro=ro, max_dst=max_dst,
                                  d_len=d_len, d=d, origin=origin)
        levels, offsets, n, hmax, bounds, levels_e = self._dev
        return shadow_ray_floors(
            levels_e, levels[: n * n], offsets=offsets, n=n,
            hmax=jnp.float32(hmax), bounds=bounds, ro=ro,
            light_to=jnp.asarray(direction, f32), max_dst=max_dst,
        )
