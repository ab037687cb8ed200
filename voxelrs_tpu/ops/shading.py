"""The frame megakernel: ray generation, shading, shadows, sky.

Functional port of the reference's full-frame compute shader
(reference: assets/shaders/world.glsl:27-141) fused with the traversal
kernel: per-pixel primary ray → SVO traversal → texture/normal lookup →
Lambert diffuse + specular → shadow ray → composite, one XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .smalltab import small_lookup
from .texture import sample_texture_lod
from .traversal import intersect_octree

# Pre-calculated per-face frames, order [x-, x+, y-, y+, z-, z+]
# (reference: assets/shaders/svo.glsl:1-29).
FACE_NORMALS = jnp.array(
    [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
    jnp.float32,
)
FACE_TANGENTS = jnp.array(
    [[0, 0, 1], [0, 0, -1], [1, 0, 0], [1, 0, 0], [-1, 0, 0], [1, 0, 0]],
    jnp.float32,
)
FACE_BITANGENTS = jnp.array(
    [[0, 1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1], [0, 1, 0], [0, 1, 0]],
    jnp.float32,
)

SKY_COLOR = jnp.array([135.0, 206.0, 235.0], jnp.float32) / 255.0
HORIZON_COLOR = jnp.ones(3, jnp.float32) * 0.7 + SKY_COLOR * 0.3


def _hard_sync(x):
    """Force completion of ``x`` (tree or array) with a 4-byte readback.

    ``block_until_ready`` does not reliably block on the axon tunnel
    backend, which made every VOXELRS_TIMING stage number a lie (stage
    boundaries were not actually synced). A tiny device->host readback is
    the only dependable completion barrier here. Every leaf is synced (a
    multi-stream backend may still be executing later-enqueued leaves when
    the first completes); zero-element leaves fall back to
    ``block_until_ready``. No-op under tracing (fused whole-frame mode
    runs with timing marks disabled)."""
    for leaf in jax.tree_util.tree_leaves(x):
        if isinstance(leaf, jax.core.Tracer):
            return
        if getattr(leaf, "size", 0):
            _ = np.asarray(jax.device_get(leaf.ravel()[0]))
        elif hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def face_texture_layer(mat_tex, value, face_id, normal: bool):
    """Texture layer for the hit face: side unless top (face 3) / bottom
    (face 2); +3 column offset for normal maps."""
    base = 3 if normal else 0
    row = small_lookup(mat_tex[:, base : base + 3], value)
    top, side, bottom = row[:, 0], row[:, 1], row[:, 2]
    return jnp.where(face_id == 3, top, jnp.where(face_id == 2, bottom, side))


def make_alpha_fn(mips, mat_tex, exact: bool = False):
    """In-traversal texel alpha sampler for translucent pass-through.

    The reference judges ``textureLod(textures, vec3(uv, tex), tex_lod).a``
    (reference: svo.esvo.glsl:235-241) — at distance the custom lod curve
    rises and the MIP alpha is a box average, so a leaf canopy's alpha-0
    holes blend away and the first leaf hit accepts. The default fast
    path here is the alpha half of the renderer's LINEAR_MIPMAP_NEAREST
    deviation: NEAREST texel at the NEAREST mip level — ONE element
    gather from a flat all-levels alpha atlas, level metadata via
    ``small_lookup``. Identical to GL for lod <= 0.5 and matching GL's
    hole-free behavior at distance (level-0-only judging kept far-canopy
    holes alive at any distance, driving resume cascades — the dominant
    judged-trace cost on the MC scene, docs/PERF.md round-5).
    ``exact=True`` uses the full trilinear sampler (footprint gathers)."""
    if exact:
        def alpha_fn(value, face_id, uv, lod):
            layer = face_texture_layer(mat_tex, value, face_id, normal=False)
            return sample_texture_lod(mips, layer, uv, lod, footprint=True
                                      )[:, 3]

        return alpha_fn

    n_levels = len(mips)
    T = mips[0].shape[0]
    flats, meta_rows = [], []
    off = 0
    for m in mips:
        h, w = m.shape[1], m.shape[2]
        flats.append(m[..., 3].reshape(-1))
        meta_rows.append((h, w, off))
        off += T * h * w
    alpha_flat = jnp.concatenate(flats)
    meta = jnp.asarray(meta_rows, jnp.int32)  # (L, 3): h, w, offset

    def alpha_fn(value, face_id, uv, lod):
        layer = jnp.clip(face_texture_layer(mat_tex, value, face_id, False),
                         0, T - 1)
        # same level rounding as sample_texture_lod(mip_mode="nearest")
        dl = jnp.round(jnp.clip(lod, 0.0, float(n_levels - 1))
                       ).astype(jnp.int32)
        row = small_lookup(meta, dl)
        h, w, off_l = row[:, 0], row[:, 1], row[:, 2]
        x = jnp.clip(jnp.floor(uv[:, 0] * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip(jnp.floor(uv[:, 1] * h).astype(jnp.int32), 0, h - 1)
        return alpha_flat[off_l + layer * h * w + y * w + x]

    return alpha_fn


def generate_rays(width, height, cam_pos, cam_right, cam_up, cam_fwd,
                  fov_y_rad, aspect):
    """Per-pixel rays (reference: world.glsl:110-129). Returns
    ro (B,3), rd (B,3) with B = width*height in image row-major order
    (row 0 = top of the image)."""
    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    u = px / width * 2.0 - 1.0
    # GL images index y bottom-up; flip so row 0 is the top of the image
    v = (height - 1.0 - py) / height * 2.0 - 1.0
    u = u * aspect * jnp.tan(fov_y_rad * 0.5)
    v = v * jnp.tan(fov_y_rad * 0.5)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    rd = (
        uu[..., None] * cam_right[None, None, :]
        + vv[..., None] * cam_up[None, None, :]
        + cam_fwd[None, None, :]
    ).reshape(-1, 3)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.broadcast_to(cam_pos, rd.shape)
    return ro, rd


def sky_color(rd):
    """Sky gradient (reference: world.glsl:92-108). acos of the horizontal
    component length is the angle to the xz plane."""
    horiz = jnp.sqrt(rd[:, 0] ** 2 + rd[:, 2] ** 2)
    a = jnp.arccos(jnp.clip(horiz, 0.0, 1.0))
    grad = a / (jnp.pi / 2.0)
    grad = 1.0 - (1.0 - grad) ** 3
    rgb = HORIZON_COLOR[None, :] * (1.0 - grad[:, None]) + SKY_COLOR[None, :] * grad[:, None]
    return jnp.concatenate([rgb, jnp.ones((rd.shape[0], 1), jnp.float32)], axis=-1)


def surface_shading(res, mips, mat_params, mat_tex, cam_pos, light_dir,
                    highlight_pos):
    """Surface color + normal-mapped lighting terms for traversal hits
    (reference: world.glsl:47-75). Returns (color, normal, diffuse,
    specular).

    Gather-lean formulation (measured on v5e — gather count dominates):
    - material row [spec_pow, spec_strength, tex0..tex5, pair0..pair2],
      face basis vectors and mip metadata are ONE-HOT reductions
      (ops/smalltab.py) — zero gathers;
    - the sampler's footprint mode packs each bilinear 2x2 window into a
      single row of the paired color+normal atlas, which stays under the
      fast-gather row-count cliff: ONE fast row gather per lane end to
      end vs 18 slow ones for the naive formulation."""
    V = mat_params.shape[0]
    T = mips[0].shape[0]
    value = jnp.clip(res.value.astype(jnp.int32), 0, V - 1)
    # face -> texture slot: top (face 3) = 0, bottom (face 2) = 2, side = 1
    slot = jnp.where(res.face_id == 3, 0, jnp.where(res.face_id == 2, 2, 1))

    mat_all = jnp.concatenate(
        [mat_params[:, :2].astype(jnp.float32), mat_tex.astype(jnp.float32)],
        axis=1,
    )
    # one-hot reduction, NOT a gather: the material table is tiny, and a
    # per-lane gather costs the same ~4.1 ms/M as a big-table one
    mrow = small_lookup(mat_all, value)
    spec_pow = jnp.maximum(mrow[:, 0], 1e-6)
    spec_strength = mrow[:, 1]
    slot_onehot = slot[:, None] == jnp.arange(3)[None, :]
    clayer = jnp.sum(jnp.where(slot_onehot, mrow[:, 2:5], 0.0), axis=1)
    nlayer = jnp.sum(jnp.where(slot_onehot, mrow[:, 5:8], 0.0), axis=1)

    # LINEAR_MIPMAP_NEAREST by default: nearest-mip stays within the
    # render-correctness budget (VOXELRS_TRILINEAR=1 restores the GL
    # reference's LINEAR_MIPMAP_LINEAR exactly). Texel fetch strategy, in
    # both cases FAST-tier (tables under the ~48K-row gather cliff, where
    # the old 39-pid paired atlas paid the 3x slow tier):
    # - registry published deduped (color,normal) pair ids (mat_tex cols
    #   6:9, <= PAIR_CAP unique pairs): ONE 8-channel paired footprint
    #   gather per lane, pair id riding the material row;
    # - otherwise: color + normal sample the raw T-layer footprint atlas
    #   separately (two gathers; XLA CSEs the atlas construction).
    import os as _os

    mip_mode = "linear" if _os.environ.get("VOXELRS_TRILINEAR") == "1" else "nearest"
    if mat_tex.shape[1] >= 9:
        from ..graphics.registry import PAIR_CAP

        pid = jnp.sum(jnp.where(slot_onehot, mrow[:, 8:11], 0.0),
                      axis=1).astype(jnp.int32)
        pslot = mat_tex[:, 6:9].reshape(-1)
        cl_u = jnp.zeros(PAIR_CAP, jnp.int32).at[pslot].set(
            jnp.clip(mat_tex[:, 0:3], 0, T - 1).reshape(-1))
        nl_u = jnp.zeros(PAIR_CAP, jnp.int32).at[pslot].set(
            jnp.clip(mat_tex[:, 3:6], 0, T - 1).reshape(-1))
        pair_mips = tuple(
            jnp.concatenate([m[cl_u], m[nl_u]], axis=-1) for m in mips
        )
        tex8 = sample_texture_lod(pair_mips, pid, res.uv, res.lod,
                                  mip_mode=mip_mode, footprint=True)
        color, ntex = tex8[:, 0:4], tex8[:, 4:8]
    else:
        color = sample_texture_lod(mips, clayer.astype(jnp.int32), res.uv,
                                   res.lod, mip_mode=mip_mode,
                                   footprint=True)
        ntex = sample_texture_lod(mips, nlayer.astype(jnp.int32), res.uv,
                                  res.lod, mip_mode=mip_mode,
                                  footprint=True)

    # block highlight outline
    same_block = jnp.all(
        jnp.floor(res.pos) == jnp.floor(highlight_pos)[None, :], axis=-1
    )
    local = jnp.abs(res.uv - 0.5) * 2.0
    lmax = jnp.maximum(local[:, 0], local[:, 1])
    outline = same_block & (lmax > 1.0 - 1.0 / 16.0)
    color = jnp.where(outline[:, None], jnp.ones((1, 4), jnp.float32), color)

    # normal mapping (.xzy swizzle: blue = up -> y axis); one fused
    # one-hot pass over the 6-row face basis instead of 3 per-lane gathers
    basis = small_lookup(
        jnp.concatenate([FACE_NORMALS, FACE_TANGENTS, FACE_BITANGENTS], axis=1),
        res.face_id,
    )
    normal, tangent, bitangent = basis[:, 0:3], basis[:, 3:6], basis[:, 6:9]
    swz = jnp.stack([ntex[:, 0], ntex[:, 2], ntex[:, 1]], axis=-1) * 2.0 - 1.0
    swz = swz / jnp.linalg.norm(swz, axis=-1, keepdims=True)
    mapped = (
        swz[:, 0:1] * tangent + swz[:, 1:2] * normal + swz[:, 2:3] * bitangent
    )
    normal = jnp.where((nlayer != -1.0)[:, None], mapped, normal)

    diffuse = jnp.maximum(jnp.sum(normal * -light_dir[None, :], axis=-1), 0.0)

    view_dir = res.pos - cam_pos[None, :]
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-12
    )
    incident = -light_dir[None, :]
    reflect_dir = incident - 2.0 * jnp.sum(normal * incident, -1, keepdims=True) * normal
    spec_dot = jnp.maximum(jnp.sum(view_dir * reflect_dir, axis=-1), 0.0)
    specular = jnp.power(spec_dot, spec_pow) * spec_strength
    return color, normal, diffuse, specular


def shade_hits(res, ro, rd, mips, mat_params, mat_tex, *, cam_pos, ambient,
               light_dir, render_shadows, shadow_distance, highlight_pos,
               descriptors, octree_scale, alpha_fn, traverse=None):
    """Shading of traversal results (reference: world.glsl:27-90)."""
    hit = res.t != -1.0
    B = res.t.shape[0]

    color, normal, diffuse, specular = surface_shading(
        res, mips, mat_params, mat_tex, cam_pos, light_dir, highlight_pos
    )

    if render_shadows:
        need = hit & (res.t < shadow_distance)
        sro = res.pos + normal * 0.001
        srd = jnp.broadcast_to(-light_dir, (B, 3))
        smax = jnp.where(need, -1.0, 1e-35)  # retire unneeded lanes instantly
        if traverse is not None:
            sres = traverse(sro, srd, smax, True, alpha_fn)
        else:
            sres = intersect_octree(
                descriptors, octree_scale, sro, srd, smax, True, alpha_fn=alpha_fn
            )
        shadow = jnp.where(need, jnp.where(sres.t < 0, 1.0, 0.0), 1.0)
    else:
        shadow = jnp.ones(B, jnp.float32)

    light = jnp.clip(ambient + (diffuse + specular) * shadow, 0.0, 1.0)
    rgb = color[:, :3] * light[:, None]
    shaded = jnp.concatenate([rgb, color[:, 3:4]], axis=-1)

    return jnp.where(hit[:, None], shaded, sky_color(rd))


# ---------------------------------------------------------------------------
# Host-orchestrated deferred render pipeline: the traversal loop runs at
# picker cost (one gather/step) and texel alpha is judged between resume
# rounds (ops.traversal.intersect_octree_deferred). One compiled round
# serves both the primary and the shadow pass.
# ---------------------------------------------------------------------------

_pipeline_cache: dict = {}


def _fused_replay_on() -> bool:
    """Opt-in (VOXELRS_FUSED_REPLAY=1): run each replayed trace as ONE
    compiled program. Measured ~1% faster steady-state over the tunnel but
    every new plan signature costs a fresh ~30 s remote compile (granular
    replay re-uses per-width round programs), so it only pays on directly
    attached hardware with local compiles."""
    import os

    return os.environ.get("VOXELRS_FUSED_REPLAY") == "1"


def compact_indices(mask, size: int):
    """Ascending indices of set lanes, padded with 0 — a drop-in for
    ``jnp.nonzero(mask, size=size, fill_value=0)[0]``.

    Bitpack + bucket-width formulation (scripts/probes/compact_probe.py,
    measured on the chip): the only full-width work is packing the mask
    into (nb, 16) u32 block words (elementwise); everything data-dependent
    — owner-block resolution, rank, bit selection — runs at ``size`` lanes.
    vs the previous blocked-cumsum + full-width masked scatter:
    9.8 -> 1.7 ms at 2.07M lanes/size 131K, 2.4 -> 0.2 ms at 519K/64K."""
    blk = 512
    w_per_blk = blk // 32
    n = mask.shape[0]
    nb = -(-n // blk)
    pad = nb * blk - n
    m = jnp.pad(mask, (0, pad)) if pad else mask
    mw = m.reshape(nb, w_per_blk, 32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(
        jnp.where(mw, weights[None, None, :], jnp.uint32(0)), axis=2,
        dtype=jnp.uint32)                                     # (nb, 16)
    pc_b = jax.lax.population_count(words).astype(jnp.int32)  # (nb, 16)
    cnt = pc_b.sum(axis=1)                                    # (nb,)
    offs = jnp.cumsum(cnt) - cnt
    total = offs[-1] + cnt[-1]

    # owner block of each output slot: each block stamps its id at its
    # start; empty blocks share a start with the NEXT nonempty block and
    # max() resolves to the true (largest-id) owner; cummax fills the rest
    own0 = jnp.zeros(size, jnp.int32).at[offs].max(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")
    own = jax.lax.cummax(own0)

    # one (size, 17) row gather serves both the block offset and its words
    tbl = jnp.concatenate(
        [offs[:, None].astype(jnp.uint32), words], axis=1)
    row = tbl[own]
    j = jnp.arange(size, dtype=jnp.int32)
    r = j - row[:, 0].astype(jnp.int32)                       # in-block rank
    wrow = row[:, 1:]
    pcs = jax.lax.population_count(wrow).astype(jnp.int32)
    cum = jnp.cumsum(pcs, axis=1)
    sel = (cum > r[:, None]) & ((cum - pcs) <= r[:, None])
    word = jnp.sum(jnp.where(sel, wrow, jnp.uint32(0)), axis=1)
    w_idx = jnp.sum(
        jnp.where(sel, jnp.arange(w_per_blk, dtype=jnp.int32), 0), axis=1)
    rw = r - jnp.sum(jnp.where(sel, cum - pcs, 0), axis=1)

    # rw-th set bit of `word` by popcount binary search
    pos = jnp.zeros(size, jnp.int32)
    cur = word
    for half in (16, 8, 4, 2, 1):
        low_mask = jnp.uint32((1 << half) - 1)
        cl = jax.lax.population_count(cur & low_mask).astype(jnp.int32)
        go_high = rw >= cl
        rw = jnp.where(go_high, rw - cl, rw)
        pos = pos + jnp.where(go_high, half, 0)
        cur = jnp.where(go_high, cur >> jnp.uint32(half), cur & low_mask)

    out = own * blk + w_idx * 32 + pos
    return jnp.where(j < total, out, 0)


def _pack_cols(arrays):
    """Bit-cast a tuple of (n,) / (n,k) channels into ONE (n, C) u32
    matrix so compaction bookkeeping moves as row gathers/scatters (cost
    is per ROW on this hardware for widths <=108, docs/PERF.md) instead
    of C per-channel passes."""
    from .traversal import _lane_to_u32

    cols = []
    for a in arrays:
        if a.ndim == 1:
            cols.append(_lane_to_u32(a))
        else:
            cols.extend(_lane_to_u32(a[:, j]) for j in range(a.shape[1]))
    return jnp.stack(cols, axis=1)


def _unpack_cols(mat, templates):
    """Inverse of ``_pack_cols`` (dtypes/widths from template arrays; the
    row count comes from ``mat``)."""
    from .traversal import _lane_from_u32

    out = []
    col = 0
    for a in templates:
        if a.ndim == 1:
            out.append(_lane_from_u32(mat[:, col], a.dtype))
            col += 1
        else:
            k = a.shape[1]
            out.append(jnp.stack(
                [_lane_from_u32(mat[:, col + j], a.dtype) for j in range(k)],
                axis=1))
            col += k
    return tuple(out)


def _compact_packed_on() -> bool:
    """Packed-gather wavefront compaction (default): compact the FULL
    traversal state with one wide row gather over the pack_lane_state view
    (~4-12 ns/lane; bit-exact continuation). VOXELRS_COMPACT_MODE=restart
    restores restart-based compaction (re-descend from the root at the old
    t_min — ~stack-depth extra iterations at the new width)."""
    import os

    return os.environ.get("VOXELRS_COMPACT_MODE", "packed") != "restart"


def _compact_on() -> bool:
    """Debug kill-switch for wavefront compaction (VOXELRS_COMPACT=0)."""
    import os

    return os.environ.get("VOXELRS_COMPACT", "1") != "0"


def _hole_fill_on() -> bool:
    """Per-pixel texel-judged fill of holed (alpha-0-texel) surfaces in
    the judged adaptive merge (VOXELRS_HOLE_FILL=1 enables).

    Default OFF by hardware measurement (docs/ab_r5.json): on the MC
    scene the fill's full-width alpha gather per merge level costs
    ~24 ms/frame (13.68 -> 14.85 Mrays/s without it) while buying almost
    no refine reduction — canopy cells rarely pass the coplanar
    same-surface guard, so the judged re-trace ran anyway."""
    import os

    return os.environ.get("VOXELRS_HOLE_FILL", "0") == "1"


def _fresh_on() -> bool:
    """First-segment slim-carry (opaque) fast path for fresh judged lanes
    (VOXELRS_FRESH_OPAQUE=1 enables).

    Default OFF by hardware measurement (docs/ab_r5.json): on the MC
    scene the fork measured as a small loss (piped 279.3 ms with vs
    275.1 without, within the ±5 ms noise band but never a win) while
    doubling the compiled round-body variants. Bit-identical either way
    (tests/test_render.py::test_fresh_opaque_first_segment_parity)."""
    import os

    return os.environ.get("VOXELRS_FRESH_OPAQUE", "0") == "1"


def _margin_bucket(count: int) -> int:
    return max(_bucket_size(count + count // 2 + 256), 8192)


# shadow-certificate helpers (jitted once; used at candidate-bucket width)
_uncertified = jax.jit(lambda lit, blk: ~lit & ~blk)
# scatter-max, not set: pad entries DUPLICATE real indices (lane/bucket 0),
# and a set-scatter with duplicate indices has unspecified write order — a
# pad's False could land after the real entry's True and drop a blocked
# verdict (seen as a one-pixel shadow flip on the SPMD slab path, where
# slab-local lane 0 is often a real candidate). max == OR per index.
_or_scatter = jax.jit(
    lambda blk, idx, v: blk
    | (jnp.zeros(blk.shape, jnp.int32).at[idx].max(v.astype(jnp.int32)) > 0)
)
# drop PAD lanes (compact_indices fills with duplicates of lane 0) from the
# uncertified mask: pads otherwise inflate the traced sub-bucket to the
# whole candidate bucket
_mask_pads = jax.jit(
    lambda un, cnt: un & (jnp.arange(un.shape[0]) < cnt)
)


def _fused_frame_on() -> bool:
    """Whole-frame fusion (one XLA program per steady frame). Defaults to
    the fused-replay setting: both trade recompiles-on-plan-change for
    zero per-frame dispatch overhead, the right trade on benchmark paths
    with settled plans (bench.py sets VOXELRS_FUSED_REPLAY=1)."""
    import os

    return os.environ.get(
        "VOXELRS_FUSED_FRAME", os.environ.get("VOXELRS_FUSED_REPLAY", "0")
    ) == "1"


def _async_compile_on() -> bool:
    """Background compilation of fused-replay programs (default on).

    A plan change means a fresh XLA program — seconds to minutes of
    remote compile on the tunnel attachment — and compiling it on the
    frame thread stalls that frame by the full compile (the streaming
    fly-through's 5-10 s p99 frames, docs/ROUND3.md §4). With async
    compilation the frame falls back to the already-compiled
    multi-program replay path (~1.1-1.6x the fused frame) while the new
    executable builds on a worker thread and swaps in when ready.
    Tests set VOXELRS_ASYNC_COMPILE=0 for determinism."""
    import os

    return os.environ.get("VOXELRS_ASYNC_COMPILE", "1") == "1"


class _AsyncCompiled:
    """Keyed background compiler: ``get_or_submit`` returns the compiled
    executable (plus its payload) once ready, else submits and returns
    None. Failed keys (e.g. a plan mutated before the background trace
    ran) are dropped permanently — their cache key can't recur."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._done: dict = {}
        self._failed: set = set()
        self._inflight: set = set()
        self._exec = None

    def get_or_submit(self, key, jfn, args, payload=None):
        with self._lock:
            if key in self._done:
                return self._done[key]
            if key in self._failed or key in self._inflight:
                return None
            self._inflight.add(key)
        if self._exec is None:
            from concurrent.futures import ThreadPoolExecutor

            self._exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="fused-compile")

        def work():
            try:
                compiled = jfn.lower(*args).compile()
            except Exception:
                with self._lock:
                    self._failed.add(key)
                    self._inflight.discard(key)
                return
            with self._lock:
                if len(self._done) >= 64:
                    self._done.pop(next(iter(self._done)))
                self._done[key] = (compiled, payload)
                self._inflight.discard(key)

        self._exec.submit(work)
        return None


_ASYNC_COMPILED = _AsyncCompiled()


def _avals_at_width(args, w0: int, w: int):
    """ShapeDtypeStruct pytree for ``args`` with every dimension equal to
    ``w0`` (the captured lane width, always >= 8192 so texture/stack dims
    cannot collide) remapped to ``w`` — the aval signature of the same
    call at a different wavefront width, for background AOT warming."""
    def cvt(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            shape = tuple(w if d == w0 else d for d in x.shape)
            return jax.ShapeDtypeStruct(shape, x.dtype)
        return x

    return jax.tree_util.tree_map(cvt, args)


class _ShapeWarm:
    """Registry of program SHAPES already compiled in this process, plus a
    background AOT warmer (streaming p99, VERDICT r4 item 6a).

    A stale wavefront plan re-records on the frame thread, and any NEW
    bucket width there used to mean synchronous remote compiles
    (measured: a 60.9 s frame on one bucket-growth event during the
    streaming fly-through). Under VOXELRS_ASYNC_COMPILE the recording
    path now refuses to enter cold shapes: it keeps tracing at the
    current width (correct, just wider) and submits the cold shapes
    here. ``jfn.lower(*avals).compile()`` on the worker thread populates
    the persistent compile cache, after which the bundle is marked warm
    and the affected plan is invalidated so the next recording compacts
    normally at a cache-load cost (~0.1-1 s) instead of the remote
    compiler."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._seen: set = set()
        self._inflight: set = set()
        self._exec = None

    def have(self, *key) -> bool:
        with self._lock:
            return key in self._seen

    def note(self, *key) -> None:
        with self._lock:
            self._seen.add(key)

    def trace_widths(self):
        """Noted full-trace widths (for sticky-bucket width reuse)."""
        with self._lock:
            return sorted(w for (kind, w) in (
                k for k in self._seen if len(k) == 2 and k[0] == "trace"))

    def submit(self, key, thunks, on_done=None) -> None:
        """Run ``thunks`` serially on the worker; mark ``key`` warm when
        ALL succeed, then call ``on_done`` (e.g. invalidate the plan that
        was blocked on this bundle)."""
        with self._lock:
            if key in self._seen or key in self._inflight:
                return
            self._inflight.add(key)
            if self._exec is None:
                from concurrent.futures import ThreadPoolExecutor

                self._exec = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="shape-warm")

        def work():
            try:
                for t in thunks:
                    t()
            except Exception:
                with self._lock:
                    self._inflight.discard(key)
                return
            with self._lock:
                self._seen.add(key)
                self._inflight.discard(key)
            if on_done is not None:
                try:
                    on_done()
                except Exception:
                    pass

        self._exec.submit(work)


def _arg_avals(args):
    """Hashable (shape, dtype) signature of a pytree of arrays — part of
    async-compile keys so a grown SVO buffer (fat-row ladder) maps to a
    fresh executable instead of an aval-mismatched call."""
    return tuple(
        (tuple(l.shape), str(l.dtype))
        for l in jax.tree_util.tree_leaves(args)
        if hasattr(l, "shape")
    )


def _fused_trace_entry(fn, fargs):
    """(callable, args) for a fused per-trace replay — the jitted ``fn``
    itself when compiles are synchronous, the background-compiled
    executable when VOXELRS_ASYNC_COMPILE is on, or None while that
    executable is still building (the caller then falls back to the
    multi-program replay for this frame instead of stalling on a remote
    compile)."""
    if not _async_compile_on():
        return fn, fargs
    got = _ASYNC_COMPILED.get_or_submit(
        ("trace", id(fn), _arg_avals(fargs)), fn, fargs)
    if got is None:
        return None
    return got[0], fargs


def _make_sun_ready(store, tr_planner, beams):
    """Sun-map attach transition guard: the first frames after
    ``beams.has_sun()`` flips would compile the sun-verdict programs at
    the candidate-bucket widths ON the frame thread (measured ~10 s
    frames over the remote-compile tunnel). Under async compile, the
    eager path keeps tracing with the already-warm envelope floors while
    a background thunk runs the cert program once per width; fused
    traces (structure fixed by their flags) always use certs. The
    certificate==trace identity makes both choices bit-identical."""
    def ready(kc: int) -> bool:
        if tr_planner is not None or not _async_compile_on():
            return True
        warm = getattr(store, "warm", None)
        if warm is None or warm.have("sunv", kc):
            return True

        def thunk(kc=kc, beams=beams):
            out = beams.sun_verdicts(
                jnp.zeros((kc, 3), jnp.float32), jnp.zeros(kc, jnp.float32))
            jax.block_until_ready(out)

        warm.submit(("sunv", kc), [thunk])
        return False

    return ready


class _IncompleteFramePlan(Exception):
    """Raised while tracing a fused whole-frame program when a plan or
    sticky bucket is not recorded yet — the caller falls back to the
    multi-program path for this frame (which records it)."""


class _StageCut(Exception):
    """Raised by the VOXELRS_STAGE_CUT profiling mark to truncate the
    fused frame trace after a named stage (see _render_frame_opaque)."""


def _anchor_all(ref):
    """Profiling anchor over EVERY array leaf of a mark's ref pytree.

    Carry-forcing (VERDICT r4 item 8): anchoring only one output (e.g.
    the t chain) lets XLA dead-code-eliminate the other loop carries
    (value/face/pos/uv/scale/plane) from every trace before the cut, so
    adjacent stage deltas mis-attribute the dropped carries to whichever
    later stage first forces them. Summing all leaves pins the full
    carry set at each cut point."""
    leaves = [l for l in jax.tree_util.tree_leaves(ref)
              if hasattr(l, "dtype")]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


class _SnapshotPlanner:
    """Read-only plan view used while TRACING a fused whole-frame program.

    Every host decision (trace plan, sticky bucket) must already be
    recorded in the backing store — a missing one raises
    ``_IncompleteFramePlan`` and the frame falls back to the multi-program
    path. Per-segment device counts are collected (as tracers) and
    returned as program outputs, so the store's two-frame-lag async plan
    refresh keeps working across fused frames."""

    def __init__(self, store):
        self.store = store
        self.meta: list = []    # (tag, n, seg_lens) in call order
        self.arrays: list = []  # one flat count array per meta entry

    def reset(self):
        self.meta.clear()
        self.arrays.clear()

    def lookup(self, tag, n):
        with self.store.lock:
            stored = self.store.plans.get(tag)
        plan = stored[1] if (stored and stored[0] == n) else None
        if plan is None:
            raise _IncompleteFramePlan(tag)
        return plan

    def record(self, tag, n, plan):  # pragma: no cover - lookup raises first
        raise _IncompleteFramePlan(tag)

    def bucket_hint(self, tag, i):
        return self.store.bucket_hint(tag, i)

    def sticky_scalar(self, name, count_dev, cap):
        with self.store.lock:
            prev = self.store.plans.get(name)
        if prev is None:
            raise _IncompleteFramePlan(name)
        self.meta.append((("scalar", name, cap), None, []))
        self.arrays.append(jnp.asarray(count_dev).reshape(-1))
        return min(prev, cap)

    def sticky_sync(self, name, needed, cap):  # pragma: no cover
        raise _IncompleteFramePlan(name)  # sync readback can't trace

    def push_pending(self, tag, n, seg_lens, counts_dev):
        flat = [jnp.asarray(c).reshape(-1) for c in counts_dev]
        self.meta.append((tag, n, seg_lens))
        self.arrays.append(
            flat[0] if len(flat) == 1 else jnp.concatenate(flat)
        )

    def flush_to_store(self, count_arrays):
        """Push the EXECUTED count arrays (one per meta entry, in call
        order) into the backing store's pending queue."""
        for (tag, n, seg_lens), arr in zip(self.meta, count_arrays):
            self.store.push_pending(tag, n, seg_lens, [arr])


class _StaticPlanner:
    """Content-independent plan source for SPMD execution.

    Every decision is a pure function of static shapes: traces run one
    full-budget segment with NO compaction (``lookup`` returns a
    single-segment plan), sticky buckets sit at their caps, and counts
    are discarded. The frame body under this planner traces into one XLA
    program with zero host state — exactly what a ``shard_map`` over a
    device mesh needs, where all devices must run the SAME program and no
    per-device host decision can exist (parallel/mesh.py). Compaction /
    recorded-plan replay are single-host perf features; the SPMD path
    trades their pad savings for determinism across shards."""

    def lookup(self, tag, n):
        return [(1 << 30, None)]  # one full-budget segment (clamped)

    def record(self, tag, n, plan):  # pragma: no cover - lookup never None
        raise AssertionError("static planner never records")

    def bucket_hint(self, tag, i):
        return None

    def sticky_scalar(self, name, count_dev, cap):
        return cap

    def push_pending(self, tag, n, seg_lens, counts_dev):
        pass


def _plan_snapshot(store):
    """Hashable snapshot of every recorded plan/bucket — the fused-frame
    cache key component that invalidates when any decision changes."""
    with store.lock:
        items = []
        for t, v in store.plans.items():
            if isinstance(v, tuple) and len(v) == 2 and isinstance(v[1], list):
                v = (v[0], tuple(v[1]))
            items.append((t, v))
    return tuple(sorted(items, key=repr))


def _should_compact(width: int, bucket) -> bool:
    """Whether shrinking ``width`` lanes to ``bucket`` pays for itself.

    Compaction costs a full-width nonzero ordering + a packed row gather +
    a frozen-record scatter (~fixed few ms inside the program); the
    bandwidth it saves scales with the lanes removed. Below the width
    floor (VOXELRS_COMPACT_FLOOR, default 32768) those savings are
    micro — the round-4 plan ledger shows recorded plans carrying 3-4
    tail compactions per trace at 8-24K widths — so small widths only
    compact on a drastic (4x) shrink."""
    import os

    if bucket is None:
        return False
    if bucket > (width * 3) // 4:
        return False
    floor = int(os.environ.get("VOXELRS_COMPACT_FLOOR", "32768"))
    if width <= floor and bucket > width // 4:
        return False
    return True


def _sticky_bucket(prev, count: int) -> int:
    """Reuse the previous bucket while it still fits — every distinct
    bucket is a compiled shape (minutes of remote compile), so plans must
    not wobble with per-frame count noise. Padded lanes cost microseconds;
    shrink only when the bucket is >8x oversized. The 25% + 256 margin
    absorbs frame-to-frame count drift under camera motion — an overflow
    marks the whole plan stale (a full re-synced frame, ~6 x 26 ms of
    readbacks), so flapping costs far more than pad lanes."""
    need = count + (count >> 2) + 256
    if prev is not None and need <= prev and prev <= 8 * max(need, 2048):
        return prev
    return _margin_bucket(count)


class _PlanStore:
    """Per-pipeline wavefront-plan replay state: records each pass's
    segment/compaction decisions and replays them on later frames without
    intra-frame count syncs (counts stream back in one batched readback at
    the next frame's start; an overflowed bucket marks the plan stale)."""

    def __init__(self, merge_none_below: int = 0):
        import collections
        import threading

        self.plans: dict = {}
        self.pending: list = []
        # count batches whose async host copy is in flight, oldest first,
        # and the daemon thread currently materializing the oldest one —
        # the blocking device->host read happens OFF the frame thread
        # (it cost ~26-108 ms/frame on the critical path, host profile
        # round 3)
        self._ready_q: collections.deque = collections.deque()
        self._reader = None
        # last known per-segment buckets per tag — consulted by SYNCED
        # explorations so a re-synced plan re-picks the same compiled
        # shapes instead of flapping between adjacent ladder points
        self.history: dict = {}
        self.lock = threading.Lock()
        # widths below this merge consecutive compaction-free segments into
        # one round (dispatches over the tunnel cost ~25-30 ms each); the
        # opaque pipeline merges at ANY width (its rounds carry no alpha
        # judgement), the translucent one only in the straggler tail
        self.merge_none_below = merge_none_below

    def lookup(self, tag, n):
        import os

        if os.environ.get("VOXELRS_PLAN", "1") == "0":
            return None
        with self.lock:
            stored = self.plans.get(tag)
        plan = stored[1] if (stored and stored[0] == n) else None
        if os.environ.get("VOXELRS_PLAN_DEBUG"):
            print(f"    [plan {tag}] "
                  f"{'replay ' + str(plan) if plan else 'SYNCED'}", flush=True)
        return plan

    def record(self, tag, n, plan):
        import os

        if os.environ.get("VOXELRS_PLAN", "1") == "0":
            return
        with self.lock:
            self.plans[tag] = (n, plan)
            self.history[tag] = [b for _seg, b in plan]

    def invalidate(self, tag):
        """Drop a recorded plan (background shape-warm completion: the
        next recording can now take the compaction it had to skip)."""
        with self.lock:
            self.plans.pop(tag, None)

    def bucket_hint(self, tag, i):
        """Bucket used for segment ``i`` the last time this tag ran."""
        with self.lock:
            hist = self.history.get(tag)
        return hist[i] if hist and i < len(hist) else None

    def push_pending(self, tag, n, seg_lens, counts_dev):
        with self.lock:
            self.pending.append((tag, n, seg_lens, counts_dev))

    def _rotate_pending(self):
        """Concatenate the queued count arrays into one stable-shape device
        buffer and start its async host copy; the batch becomes readable at
        the NEXT resolve."""
        with self.lock:
            work, self.pending[:] = list(self.pending), []
        if not work:
            return
        flat = [jnp.asarray(c).reshape(-1) for (_, _, _, cs) in work
                for c in cs]
        sizes = [int(a.shape[0]) for a in flat]
        total = sum(sizes)
        if total:
            # stable shape — a varying length would compile a fresh concat
            # program every frame (seconds of remote compile)
            n_pad = -(-total // 16) * 16
            pads = ([jnp.zeros(n_pad - total, jnp.int32)]
                    if n_pad > total else [])
            flat_dev = jnp.concatenate(flat + pads)
            try:
                flat_dev.copy_to_host_async()
            except Exception:
                pass  # backend without async host copies: resolve blocks
        else:
            flat_dev = None
        with self.lock:
            self._ready_q.append((work, flat_dev, sizes))

    def sticky_scalar(self, name, count_dev, cap):
        """Bucket for a lane subset sized by an async device count: replay
        last frame's sticky value (no sync); first frame reads it back."""
        with self.lock:
            prev = self.plans.get(name)
            self.pending.append((("scalar", name, cap), None, [], [count_dev]))
        if prev is not None:
            return min(prev, cap)
        # synchronous first pick / post-overflow re-sync: exact for this
        # frame, with margin so steady growth doesn't overflow immediately
        need = int(count_dev)
        k = _margin_bucket(need)
        warm = getattr(self, "warm", None)
        if (warm is not None and getattr(self, "_epoch", 0) >= 8
                and _async_compile_on() and k <= cap
                and not warm.have("trace", k)):
            # cold-shape guard: a NEW tag width means fresh trace programs
            # compiling on the frame thread — reuse the smallest width a
            # trace has already run at instead (pad lanes are masked work)
            bigger = [w for w in warm.trace_widths() if w >= need]
            if bigger:
                k = bigger[0]
        return min(cap, k)

    def sticky_sync(self, name, needed, cap):
        """Synchronous sticky bucket (exact, one readback already paid)."""
        with self.lock:
            prev = self.plans.get(name)
            target = _bucket_size(needed)
            k = prev if (prev is not None and prev >= needed
                         and prev <= 4 * target) else target
            self.plans[name] = k
        return min(k, cap)

    def resolve(self):
        """Refresh (or invalidate) the recorded plans from per-segment
        counts. Counts resolve with a TWO-frame lag and WITHOUT blocking
        the frame thread: at the end of frame N the pending batch is
        concatenated and its host copy starts asynchronously; a daemon
        reader thread materializes it (absorbing the tunnel round trip,
        ~26 ms, which used to sit on the critical path of every frame);
        frame N+2's resolve applies the landed values."""
        import os
        import threading

        # rotate: start the async host copy for the batch queued this frame
        self._rotate_pending()

        # collect the reader's landed batch (non-blocking)
        batch = None
        if self._reader is not None:
            th, box = self._reader
            if th.is_alive():
                with self.lock:
                    backlog = len(self._ready_q)
                if backlog < 8:
                    return  # nothing landed yet; try again next frame
                th.join()  # pathological backlog: fall back to blocking
            else:
                th.join()
            batch = box[0] if box else None
            self._reader = None

        # keep the reader busy with the oldest in-flight batch
        with self.lock:
            nxt = self._ready_q.popleft() if self._ready_q else None
        if nxt is not None:
            work_n, flat_n, sizes_n = nxt
            box_n: list = []

            def _read(work=work_n, flat=flat_n, sizes=sizes_n, out=box_n):
                total = sum(sizes)
                vals = ([int(v) for v in np.asarray(flat)[:total]]
                        if flat is not None else [])
                out.append((work, sizes, vals))

            th = threading.Thread(target=_read, daemon=True,
                                  name="plan-count-reader")
            th.start()
            self._reader = (th, box_n)

        if batch is None:
            return
        work, sizes, values = batch
        # periodic refresh: rebuild segment plans from the latest counts
        # (NOT a full re-sync — the segment boundaries are a fixed schedule,
        # so the lagged counts carry everything a synced exploration would
        # rediscover; a rebuild only costs a compile if the plan actually
        # changes)
        self._epoch = getattr(self, "_epoch", 0) + 1
        refresh = self._epoch % 256 == 0
        pos = 0
        entry_i = 0
        debug = os.environ.get("VOXELRS_PLAN_DEBUG")
        for tag, n, segs, cs in work:
            take = sum(sizes[entry_i : entry_i + len(cs)])
            entry_i += len(cs)
            counts = values[pos : pos + take]
            pos += take
            if isinstance(tag, tuple) and tag and tag[0] == "scalar":
                _, name, cap = tag
                count = counts[0]
                with self.lock:
                    prev = self.plans.get(name)
                if prev is not None and count > prev:
                    # the overflow TRUNCATED that frame's lane set (dropped
                    # pixels render as sky / rays go unshadowed) and this
                    # count is already two frames old — growing from it can
                    # lag a moving camera indefinitely. Drop the sticky value
                    # so the next sticky_scalar() pays one exact synchronous
                    # readback and picks a bucket that fits THAT frame.
                    if debug:
                        print(f"    [plan {name}] overflowed (re-sync)",
                              flush=True)
                    with self.lock:
                        self.plans.pop(name, None)
                    continue
                with self.lock:
                    self.plans[name] = min(cap, _sticky_bucket(prev, count))
                continue
            with self.lock:
                old = self.plans.get(tag)
            old_plan = old[1] if old and old[0] == n else []
            # structural hysteresis: every distinct plan TUPLE is a distinct
            # compiled program (seconds of remote compile under fused
            # replay), so a replayed plan is kept VERBATIM while it still
            # fits — it only rebuilds on overflow (stale), when a bucket is
            # grossly (>8x) oversized, or at the periodic refresh epoch.
            # Without this, per-frame count noise under camera motion
            # reshaped plans nearly every frame and the fly-through spent
            # seconds/frame compiling (round-3 audit, docs/PERF.md).
            stale = False
            oversized = False
            for i, (seg, bucket) in enumerate(old_plan):
                count = counts[i] if i < len(counts) else 0
                if bucket is None:
                    continue
                need = count + (count >> 2) + 256
                if count > bucket:
                    stale = True
                elif bucket > 8 * max(need, 2048):
                    oversized = True
            if old_plan and not stale and not oversized and not refresh:
                continue  # keep the recorded plan (and its compiled shape)
            new_plan = []
            w = n
            for i, (seg, count) in enumerate(zip(segs, counts)):
                replayed = old_plan[i][1] if i < len(old_plan) else None
                bucket = _sticky_bucket(replayed, count)
                if count > 0 and _should_compact(w, bucket):
                    new_plan.append((seg, bucket))
                    w = bucket
                else:
                    new_plan.append((seg, None))
                if count == 0:
                    break
            if not stale and self.merge_none_below:
                merged = []
                w = n
                for seg, bucket in new_plan:
                    if (bucket is None and merged and merged[-1][1] is None
                            and w <= self.merge_none_below):
                        merged[-1] = (merged[-1][0] + seg, None)
                    else:
                        merged.append((seg, bucket))
                    if bucket is not None:
                        w = bucket
                new_plan = merged
            if debug and stale:
                print(f"    [plan {tag}] STALE (bucket overflow)", flush=True)
            with self.lock:
                self.plans[tag] = None if stale else (n, new_plan)
                # history updates even on stale: its buckets grew with the
                # overflowing counts, steering the re-sync to a shape that
                # fits (instead of flapping back to the smaller ladder point)
                self.history[tag] = [b for _seg, b in new_plan]


def _pix_rays_for(width: int, height: int, full_height: int | None = None):
    """Pixel-ray derivation from flat pixel ids — bit-identical to
    ``generate_rays`` (shared by the adaptive passes).

    ``full_height`` (multi-chip row-slab sharding): the pixel ids address a
    ``height``-row slab of a ``width x full_height`` global frame whose
    first global row arrives as a traced scalar in ``ray_args[6]`` — the
    SPMD frame program derives it from the mesh axis index, so one
    compiled program serves every device (parallel/mesh.py)."""
    fh = float(full_height if full_height is not None else height)

    def pix_rays(idx, ray_args):
        cam_pos, cam_right, cam_up, cam_fwd, fov, aspect = ray_args[:6]
        x = (idx % width).astype(jnp.float32)
        y = (idx // width).astype(jnp.float32)
        if len(ray_args) > 6:
            y = y + ray_args[6].astype(jnp.float32)
        u = (x / width * 2.0 - 1.0) * aspect * jnp.tan(fov * 0.5)
        v = ((fh - 1.0 - y) / fh * 2.0 - 1.0) * jnp.tan(fov * 0.5)
        rd = (u[:, None] * cam_right[None, :] + v[:, None] * cam_up[None, :]
              + cam_fwd[None, :])
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        ro = jnp.broadcast_to(cam_pos, rd.shape)
        return ro, rd

    return pix_rays


def _coarse_grid_for(width: int, height: int):
    """(Hc, Wc, coarse_pidx_fn, up4_fn, is_sample/pick helpers) for the
    half-resolution adaptive grid."""
    Hc = height // 2 + 1 if height > 1 else 1
    Wc = width // 2 + 1 if width > 1 else 1

    def coarse_pidx():
        cy = jnp.minimum(2 * jnp.arange(Hc, dtype=jnp.int32), height - 1)
        cx = jnp.minimum(2 * jnp.arange(Wc, dtype=jnp.int32), width - 1)
        return (cy[:, None] * width + cx[None, :]).reshape(-1)

    def up4(a):
        """The 4 cell-corner values of every pixel by 2x nearest upsampling
        of the coarse grid and its +1 shifts (no gathers)."""
        g = a.reshape(Hc, Wc) if a.ndim == 1 else a.reshape(Hc, Wc, -1)
        right = jnp.concatenate([g[:, 1:], g[:, -1:]], axis=1)
        down = jnp.concatenate([g[1:], g[-1:]], axis=0)
        downright = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)

        def up(x):
            x = jnp.repeat(x, 2, axis=0)[:height]
            x = jnp.repeat(x, 2, axis=1)[:, :width]
            return x.reshape(-1) if a.ndim == 1 else x.reshape(width * height, -1)

        return up(g), up(right), up(down), up(downright)

    def sample_masks():
        lane = jnp.arange(width * height, dtype=jnp.int32)
        y = lane // width
        x = lane % width
        ylast = y == height - 1
        xlast = x == width - 1
        is_sample = ((y % 2 == 0) | ylast) & ((x % 2 == 0) | xlast)
        return is_sample, ylast, xlast

    def pick_sample(ylast, xlast, a00, a01, a10, a11):
        if a00.ndim == 2:
            ylast = ylast[:, None]
            xlast = xlast[:, None]
        return jnp.where(
            ylast & xlast, a11,
            jnp.where(ylast, a10, jnp.where(xlast, a01, a00)),
        )

    return Hc, Wc, coarse_pidx, up4, sample_masks, pick_sample


def _bucket_size(count: int) -> int:
    """Smallest size from the {2^k, 1.5*2^k} ladder covering ``count`` —
    finer than pure powers of two so compaction triggers more often, while
    keeping the set of compiled shapes small."""
    if count <= 256:
        return 256
    p = 1 << (count - 1).bit_length()  # next pow2
    if count <= (p * 3) // 4:
        return (p * 3) // 4
    return p


class _EsvoEngine:
    """ESVO push-driven engine bound into the deferred pipelines.

    ``descriptors`` is the (N,) u32 SVO buffer. The frozen record is
    (t_min, pp, idx|scale<<8, posx, posy, posz, child_ptr) — child_ptr
    (the hit node's resolved block pointer) halves finalize's value
    fetches."""

    name = "esvo"
    FROZEN_EXTRA = 1  # channels beyond the 6 shared ones

    @staticmethod
    def prep(descriptors):
        from .traversal import _make_fat_rows

        return _make_fat_rows(descriptors)

    @staticmethod
    def start(descriptors, scale, ro, rd, max_dst, stack_height):
        from .traversal import init_state_push, make_ray_consts

        c = make_ray_consts(scale, ro, rd, max_dst)
        return c, init_state_push(c, stack_height)

    @staticmethod
    def restart(descriptors, c, *, t_floor, inside, adj_last, missed,
                suppress, stack_height):
        from .traversal import restart_state_push

        return restart_state_push(
            c, t_floor=t_floor, inside=inside, adj_last=adj_last,
            missed=missed, suppress=suppress, stack_height=stack_height,
        )

    @staticmethod
    def start_floored(descriptors, scale, ro, rd, max_dst, stack_height,
                      t_floor):
        """Start a trace with per-lane entry floors (from the conservative
        beam pre-pass, ops/beams.py): identical to ``start`` + an immediate
        restart at ``t_floor``. ``t_floor`` is in caller ray units (the
        units of ``res.t``); +inf floors (certain miss) begin inactive."""
        from .traversal import init_state_push, make_ray_consts

        c = make_ray_consts(scale, ro, rd, max_dst)
        st0 = init_state_push(c, stack_height)
        st = _EsvoEngine.restart(
            descriptors, c,
            t_floor=t_floor * jnp.asarray(scale, jnp.float32),
            inside=st0.inside,
            adj_last=st0.adj_last, missed=st0.missed, suppress=st0.suppress,
            stack_height=stack_height,
        )
        return c, st

    @staticmethod
    def run_loop(prepared, c, state, iters, substeps, opaque=False):
        from .traversal import run_loop_push

        return run_loop_push(prepared, c, state, iters, substeps,
                             opaque=opaque)

    @staticmethod
    def finalize(prepared, c, state, steps, value_override=None):
        from .traversal import finalize

        return finalize(prepared, c, state, steps,
                        value_override=value_override)

    @staticmethod
    def freeze(state):
        idxscale = (state.idx.astype(jnp.uint32)
                    | (state.scale.astype(jnp.uint32) << 8))
        return (state.t_min, state.pp, idxscale,
                state.posx, state.posy, state.posz, state.child_ptr)

    @staticmethod
    def thaw(c, frozen, hit, stack_height):
        from .traversal import init_state_push

        t_min, pp, idxscale, px, py, pz, cp = frozen
        return init_state_push(c, stack_height)._replace(
            t_min=t_min, pp=pp,
            idx=(idxscale & jnp.uint32(0xFF)).astype(jnp.int32),
            scale=(idxscale >> jnp.uint32(8)).astype(jnp.int32),
            posx=px, posy=py, posz=pz, hit=hit, child_ptr=cp,
        )

    @staticmethod
    def frozen_values(descriptors, c, frozen):
        """Leaf values for frozen hit lanes (adaptive-merge corner fetch)."""
        from .traversal import _make_fat_rows, hit_phase_fat

        t, pp, idxscale, px, py, pz, cp = frozen
        value, *_rest = hit_phase_fat(
            _make_fat_rows(descriptors), c, pp,
            (idxscale & jnp.uint32(0xFF)).astype(jnp.int32),
            (idxscale >> jnp.uint32(8)).astype(jnp.int32),
            px, py, pz, t, child_ptr=cp,
        )
        return value


class _CsvoEngine:
    """CSVO restartable engine (see traversal_csvo.py). ``descriptors`` is
    the (words, root_ptr, total_depth) pytree; the frozen record appends
    (mat_ptr, pre_leaf) — the leaf-material resolve needs both."""

    name = "csvo"
    FROZEN_EXTRA = 2

    @staticmethod
    def prep(descriptors):
        return descriptors

    @staticmethod
    def start(descriptors, scale, ro, rd, max_dst, stack_height):
        from .traversal import make_ray_consts
        from .traversal_csvo import init_state_csvo

        words, root_ptr, depth = descriptors
        c = make_ray_consts(scale, ro, rd, max_dst)
        return c, init_state_csvo(c, root_ptr, depth, stack_height)

    @staticmethod
    def restart(descriptors, c, *, t_floor, inside, adj_last, missed,
                suppress, stack_height):
        from .traversal_csvo import restart_state_csvo

        words, root_ptr, depth = descriptors
        return restart_state_csvo(
            c, t_floor=t_floor, inside=inside, adj_last=adj_last,
            missed=missed, suppress=suppress, root_ptr=root_ptr,
            total_depth=depth, stack_height=stack_height,
        )

    @staticmethod
    def start_floored(descriptors, scale, ro, rd, max_dst, stack_height,
                      t_floor):
        """See _EsvoEngine.start_floored (the pre-pass coarse world is
        always an ESVO; only the floored MAIN trace is format-specific)."""
        from .traversal import make_ray_consts
        from .traversal_csvo import init_state_csvo

        words, root_ptr, depth = descriptors
        c = make_ray_consts(scale, ro, rd, max_dst)
        st0 = init_state_csvo(c, root_ptr, depth, stack_height)
        st = _CsvoEngine.restart(
            descriptors, c,
            t_floor=t_floor * jnp.asarray(scale, jnp.float32),
            inside=st0.inside,
            adj_last=st0.adj_last, missed=st0.missed, suppress=st0.suppress,
            stack_height=stack_height,
        )
        return c, st

    @staticmethod
    def run_loop(prepared, c, state, iters, substeps, opaque=False):
        # the CSVO engine has no opaque specialization (yet); the flag is
        # accepted for interface parity and ignored
        from .traversal_csvo import run_loop_csvo

        words, _root, _depth = prepared
        return run_loop_csvo(words, c, state, iters, substeps)

    @staticmethod
    def finalize(prepared, c, state, steps, value_override=None):
        from .traversal_csvo import finalize_csvo

        words, _root, _depth = prepared
        return finalize_csvo(words, c, state, steps,
                             value_override=value_override)

    @staticmethod
    def freeze(state):
        idxscale = (state.idx.astype(jnp.uint32)
                    | (state.scale.astype(jnp.uint32) << 8))
        return (state.t_min, state.pp, idxscale,
                state.posx, state.posy, state.posz,
                state.mat_ptr, state.pre_leaf)

    @staticmethod
    def thaw(c, frozen, hit, stack_height):
        from .traversal_csvo import init_state_csvo

        t_min, pp, idxscale, px, py, pz, mat_ptr, pre_leaf = frozen
        return init_state_csvo(c, jnp.uint32(0), 0, stack_height)._replace(
            t_min=t_min, pp=pp,
            idx=(idxscale & jnp.uint32(0xFF)).astype(jnp.int32),
            scale=(idxscale >> jnp.uint32(8)).astype(jnp.int32),
            posx=px, posy=py, posz=pz, hit=hit,
            mat_ptr=mat_ptr, pre_leaf=pre_leaf,
        )

    @staticmethod
    def frozen_values(descriptors, c, frozen):
        from .traversal_csvo import hit_phase_csvo

        words, _root, _depth = descriptors
        t, pp, idxscale, px, py, pz, mat_ptr, pre_leaf = frozen
        value, *_rest = hit_phase_csvo(
            words, c, pp,
            (idxscale & jnp.uint32(0xFF)).astype(jnp.int32),
            (idxscale >> jnp.uint32(8)).astype(jnp.int32),
            px, py, pz, t, mat_ptr, pre_leaf,
        )
        return value


_ENGINES = {"esvo": _EsvoEngine, "csvo": _CsvoEngine}


def _opaque_pipeline(B: int, width: int, height: int, max_steps: int,
                     stack_height: int = 12, engine: str = "esvo",
                     full_height: int | None = None):
    """Deferred pipeline specialization for opaque worlds (no texture with
    alpha < 1 — then translucent casting is exactly first-leaf-hit casting):

    - rounds are pure traversal segments: no per-round alpha judging and no
      per-round finalize — lanes freeze in-loop at their first leaf;
    - the hit record is finalized ONCE, on the compacted hit lanes only;
    - shadow rays skip finalize entirely (only the hit flag matters);
    - compaction re-derives rays instead of gathering them: primary rays
      are a pure function of the pixel index (+ camera), shadow directions
      are a broadcast constant — so the restart gather touches only the
      resume bookkeeping (~6 lane-rows);
    - plan replay: the first frame runs "synced" (a count readback decides
      each compaction; ~30 ms tunnel latency each); the decisions are
      recorded and subsequent frames replay them with a 1.35x margin and
      ZERO intra-frame syncs — per-segment counts are read back in one
      batched transfer at the START of the next frame to refresh the plan,
      and an overflowed bucket (more survivors than replayed capacity)
      marks the plan stale so the next frame re-syncs. VOXELRS_PLAN=0
      disables replay.
    """
    key = ("opq", B, width, height, max_steps, stack_height, engine,
           full_height)
    if key in _pipeline_cache:
        return _pipeline_cache[key]

    import os as _os

    from .traversal import make_ray_consts

    eng = _ENGINES[engine]

    _substeps = int(_os.environ.get("VOXELRS_SUBSTEPS", "4"))

    # -- ray sources ---------------------------------------------------------
    # bit-identical to ``generate_rays`` so compacted lanes see the exact
    # same ray
    _pix_rays = _pix_rays_for(width, height, full_height)

    def _dir_rays(idx, ray_args):
        """Per-lane origins, constant direction (shadow rays)."""
        ro_full, rd_const = ray_args
        ro_k = ro_full[idx]
        return ro_k, jnp.broadcast_to(rd_const, ro_k.shape)

    def _pixsub_rays(idx, ray_args):
        """Pixel rays for a lane subset: lane -> global pixel id via the
        base-index table (adaptive coarse/refine passes)."""
        base_idx = ray_args[0]
        return _pix_rays(base_idx[idx], ray_args[1:])

    _RAY_FNS = {"pix": _pix_rays, "dir": _dir_rays, "pixsub": _pixsub_rays}

    def round_body(descriptors, consts, state, steps_total, seg_steps):
        if seg_steps == 0:
            # zero-length round (leading entry of beam-floored plans)
            return state, steps_total
        prepared = eng.prep(descriptors)
        steps, state = eng.run_loop(prepared, consts, state, seg_steps,
                                    _substeps, opaque=True)
        return state, steps_total + steps

    round_jit = jax.jit(round_body, donate_argnums=(2,), static_argnums=(4,))

    # frozen per-lane hit state: everything finalize needs later
    # (idx + scale packed into one word; `inside` is not recorded — no
    # consumer of this pipeline reads inside_voxel)
    _freeze = eng.freeze
    _FROZEN_C = 6 + eng.FROZEN_EXTRA

    from .traversal import _lane_from_u32, _lane_to_u32

    def _freeze_mat(state):
        """The frozen record as ONE (B, C) u32 matrix: per-compaction
        bookkeeping becomes a single 2D row gather + scatter instead of C
        channel-wise gather/scatter pairs (measured ~2x cheaper at the
        64-131K compaction widths, scripts/segment_cost_probe.py)."""
        return jnp.stack([_lane_to_u32(a) for a in _freeze(state)], axis=1)

    def _unfreeze_mat(mat, state):
        """Back to the per-channel tuple (dtypes from a freeze template)."""
        return tuple(
            _lane_from_u32(mat[:, i], a.dtype)
            for i, a in enumerate(_freeze(state))
        )

    def _scatter_frozen(frozen, hit_full, idx, state):
        take = state.hit
        cur = _freeze_mat(state)
        out = frozen.at[idx].set(jnp.where(take[:, None], cur, frozen[idx]))
        return out, hit_full.at[idx].set(hit_full[idx] | take)

    scatter_frozen = jax.jit(_scatter_frozen, donate_argnums=(0, 1))
    freeze_mat_jit = jax.jit(_freeze_mat)
    unfreeze_mat_jit = jax.jit(_unfreeze_mat)

    scatter_hit = jax.jit(
        lambda hit_full, idx, state: hit_full.at[idx].set(
            hit_full[idx] | state.hit
        ),
        donate_argnums=(0,),
    )

    def _make_compact_raw(ray_fn):
        packed = _compact_packed_on()

        def f(descriptors, scale, ray_args, max_dst, state, gidx, sub_idx):
            ro_k, rd_k = ray_fn(gidx, ray_args)
            md_k = max_dst if jnp.ndim(max_dst) == 0 else max_dst[gidx]
            sub_consts = make_ray_consts(scale, ro_k, rd_k, md_k)
            # packed-gather compaction is a row gather over a (src, ~60)
            # u32 view; row gathers fall off a cliff once the table passes
            # ~130K rows (scripts/segment_cost_probe.py: ~170 ns/row from a
            # 518K-row table), where a restart re-descent is cheaper — so
            # choose by the STATIC source width
            if packed and state.active.shape[0] <= (1 << 17):
                from .traversal import gather_lane_state

                # bit-exact state continuation: one wide row gather over
                # the packed (B, W) u32 state view
                return sub_consts, gather_lane_state(state, sub_idx)
            sub_state = eng.restart(
                descriptors, sub_consts,
                t_floor=state.t_min[sub_idx],
                inside=state.inside[sub_idx],
                adj_last=state.adj_last[sub_idx],
                missed=state.missed[sub_idx],
                suppress=state.suppress[sub_idx],
                stack_height=stack_height,
            )
            # pad lanes (fill-repeats of lane 0) must stay retired
            sub_state = sub_state._replace(
                active=sub_state.active & state.active[sub_idx]
            )
            return sub_consts, sub_state

        return f

    compact_raw = {"pix": _make_compact_raw(_pix_rays),
                   "dir": _make_compact_raw(_dir_rays),
                   "pixsub": _make_compact_raw(_pixsub_rays)}
    compact_jits = {m: jax.jit(f) for m, f in compact_raw.items()}
    pix_rays_jit = jax.jit(_pix_rays)

    start = jax.jit(
        lambda descriptors, scale, ro, rd, max_dst: eng.start(
            descriptors, scale, ro, rd, max_dst, stack_height
        )
    )
    start_floored = jax.jit(
        lambda descriptors, scale, ro, rd, max_dst, tf: eng.start_floored(
            descriptors, scale, ro, rd, max_dst, stack_height, tf
        )
    )

    active_count = jax.jit(lambda state: jnp.sum(state.active))
    order_active = jax.jit(
        lambda state, size: compact_indices(state.active, size),
        static_argnums=(1,),
    )

    store = _PlanStore(merge_none_below=1 << 62)  # no judge in rounds
    warm = _ShapeWarm()
    store.warm = warm

    # -- fused replay: one compiled program per recorded plan -------------
    # A replayed trace is a FIXED sequence of rounds and static-bucket
    # compactions; running it as one jit removes ~8-14 per-frame dispatches
    # (and their queue bubbles) per trace. Per-segment survivor counts
    # return as one stacked array for the next frame's plan refresh.
    _fused_cache: dict = {}

    def _fused_replay(mode, plan_key, record_frozen, floored=False):
        key = (mode, plan_key, record_frozen, floored)
        if key in _fused_cache:
            return _fused_cache[key]

        compact_fn = compact_raw[mode]
        plan = list(plan_key)

        def fused(descriptors, scale, ro, rd, max_dst, ray_args,
                  t_floor=None):
            prepared = eng.prep(descriptors)
            if floored:
                consts, state = eng.start_floored(
                    descriptors, scale, ro, rd, max_dst, stack_height,
                    t_floor)
            else:
                consts, state = eng.start(descriptors, scale, ro, rd,
                                          max_dst, stack_height)
            n = ro.shape[0]
            frozen = jnp.zeros((n, _FROZEN_C), jnp.uint32)
            hit_full = jnp.zeros(n, bool)
            steps_total = jnp.int32(0)
            counts = []
            idx = None
            width_now = n
            budget = max_steps
            segs = [(seg, bucket) for seg, bucket in plan]
            if sum(s for s, _ in plan) < max_steps:
                segs.append((max_steps - sum(s for s, _ in plan), None))
            for seg, bucket in segs:
                seg = min(seg, budget)
                if seg <= 0 and budget <= 0:
                    break
                if seg > 0:
                    steps, state = eng.run_loop(prepared, consts, state, seg,
                                                _substeps, opaque=True)
                    steps_total = steps_total + steps
                    budget -= seg
                counts.append(jnp.sum(state.active).astype(jnp.int32))
                if _should_compact(width_now, bucket) and _compact_on():
                    sub_idx = compact_indices(state.active, bucket)
                    gidx = sub_idx if idx is None else idx[sub_idx]
                    if idx is None:
                        hit_full = state.hit
                        if record_frozen:
                            frozen = _freeze_mat(state)
                    elif record_frozen:
                        frozen, hit_full = _scatter_frozen(
                            frozen, hit_full, idx, state
                        )
                    else:
                        hit_full = hit_full.at[idx].set(hit_full[idx]
                                                        | state.hit)
                    consts, state = compact_fn(descriptors, scale, ray_args,
                                               max_dst, state, gidx, sub_idx)
                    idx = gidx
                    width_now = bucket
            if idx is None:
                hit_full = state.hit
                if record_frozen:
                    frozen = _freeze_mat(state)
            elif record_frozen:
                frozen, hit_full = _scatter_frozen(frozen, hit_full, idx,
                                                   state)
            else:
                hit_full = hit_full.at[idx].set(hit_full[idx] | state.hit)
            return (_unfreeze_mat(frozen, state), hit_full, steps_total,
                    jnp.stack(counts))

        _fused_cache[key] = jax.jit(fused)
        return _fused_cache[key]

    def trace(descriptors, scale, ro, rd, max_dst, mode, ray_args, tag,
              record_frozen: bool = True, t_floor=None, planner=None):
        """Opaque deferred trace. Returns (frozen, hit, steps_total) at full
        width; ``frozen`` feeds ``finalize_lanes``. ``record_frozen=False``
        (shadow rays) keeps only the hit mask — no frozen-state scatters.
        ``planner`` (fused whole-frame tracing) substitutes the plan store:
        decisions must be pre-recorded, counts are collected as outputs."""
        pl = planner if planner is not None else store
        compact_jit = compact_jits[mode]
        if t_floor is None:
            consts, state = start(descriptors, scale, ro, rd, max_dst)
        else:
            consts, state = start_floored(descriptors, scale, ro, rd,
                                          max_dst, t_floor)
            tag = (tag, "fl")
        n = ro.shape[0]
        frozen = jnp.zeros((n, _FROZEN_C), jnp.uint32)
        hit_full = jnp.zeros(n, bool)
        steps_total = jnp.int32(0)

        seg0 = int(_os.environ.get("VOXELRS_SEG", "16"))
        schedule = [seg0] * 5  # fine early grid: deep worlds need ~40+
        while sum(schedule) < max_steps:  # iterations at interesting widths
            schedule.append(min(schedule[-1] * 2, max_steps - sum(schedule)))
        if t_floor is not None:
            # zero-length first round: drop certain-miss lanes before any
            # traversal iterations
            schedule = [0] + schedule

        timing = planner is None and _os.environ.get("VOXELRS_TIMING") == "1"

        def tmark(label):
            if not timing:
                return
            import time as _t

            now = _t.perf_counter()
            print(f"      {label}: {(now - tmark.t0) * 1e3:.0f} ms", flush=True)
            tmark.t0 = now

        if timing:
            import time as _t

            _hard_sync(state.t_min)
            tmark.t0 = _t.perf_counter()

        plan = pl.lookup(tag, n)

        idx = None
        cur_consts, cur_state = consts, state
        width_now = n

        def do_compact(bucket):
            nonlocal idx, cur_consts, cur_state, width_now
            nonlocal frozen, hit_full
            warm.note("bundle", width_now, bucket)
            sub_idx = order_active(cur_state, bucket)
            gidx = sub_idx if idx is None else idx[sub_idx]
            if idx is None:
                hit_full = cur_state.hit
                if record_frozen:
                    frozen = freeze_mat_jit(cur_state)
            elif record_frozen:
                frozen, hit_full = scatter_frozen(frozen, hit_full, idx,
                                                  cur_state)
            else:
                hit_full = scatter_hit(hit_full, idx, cur_state)
            cur_consts, cur_state = compact_jit(
                descriptors, scale, ray_args, max_dst, cur_state, gidx,
                sub_idx
            )
            idx = gidx
            width_now = bucket
            if timing:
                _hard_sync(cur_state.t_min)
                tmark(f"compact->{bucket}")

        def _submit_bundle_o(bucket):
            """Opaque counterpart of _submit_bundle_j (see _ShapeWarm)."""
            w = width_now
            st_av, cons_av = _avals_at_width((cur_state, cur_consts), w,
                                             bucket)
            stw = cur_state
            bidx = jax.ShapeDtypeStruct((bucket,), jnp.int32)
            seg_w = seg0
            thunks = [
                lambda: order_active.lower(stw, bucket).compile(),
                lambda: compact_jit.lower(
                    descriptors, scale, ray_args, max_dst, stw, bidx,
                    bidx).compile(),
                lambda: round_jit.lower(
                    descriptors, cons_av, st_av, steps_total,
                    seg_w).compile(),
                lambda: active_count.lower(st_av).compile(),
            ]
            warm.submit(("bundle", w, bucket), thunks,
                        on_done=lambda: store.invalidate(tag))

        budget = max_steps
        guard = (_async_compile_on() and pl is store
                 and getattr(store, "_epoch", 0) >= 8)
        if plan is None:
            # synced exploration: a count readback decides each compaction.
            # Under the cold-shape guard (see the judged pipeline) the
            # schedule is seg0-sized rounds only and cold compaction
            # shapes are skipped + background-warmed instead of compiled
            # on the frame thread.
            if guard:
                schedule = [0] * (schedule[0] == 0) + [seg0] * (
                    -(-max_steps // seg0))
            plan_rec = []
            seg_lens = []
            counts_dev = []
            for seg_i, steps in enumerate(schedule):
                seg = min(steps, budget)
                cur_state, steps_total = round_jit(
                    descriptors, cur_consts, cur_state, steps_total, seg
                )
                if seg > 0:
                    warm.note("round", width_now, seg)
                if timing:
                    _hard_sync(cur_state.t_min)
                    tmark(f"round w={width_now}")
                budget -= seg
                seg_lens.append(seg)
                if budget <= 0:
                    plan_rec.append((seg, None))
                    break
                cdev = active_count(cur_state)
                counts_dev.append(cdev)
                count = int(cdev)
                tmark("count-sync")
                if timing:
                    print(f"    seg len={seg} width={width_now} active={count}",
                          flush=True)
                if count == 0:
                    plan_rec.append((seg, None))
                    break
                bucket = _sticky_bucket(pl.bucket_hint(tag, seg_i), count)
                if count > 0 and _should_compact(width_now, bucket) and _compact_on():
                    if guard and not warm.have("bundle", width_now, bucket):
                        _submit_bundle_o(bucket)
                        plan_rec.append((seg, None))
                    else:
                        plan_rec.append((seg, bucket))
                        do_compact(bucket)
                else:
                    plan_rec.append((seg, None))
            pl.record(tag, n, plan_rec)
        elif _fused_replay_on() and (fused_entry := _fused_trace_entry(
                _fused_replay(mode, tuple(plan), record_frozen,
                              floored=t_floor is not None),
                (descriptors, scale, ro, rd, max_dst, ray_args)
                if t_floor is None else
                (descriptors, scale, ro, rd, max_dst, ray_args, t_floor),
        )) is not None:
            fused_call, fargs = fused_entry
            frozen, hit_full, steps_total, counts = fused_call(*fargs)
            seg_lens = []
            for seg, _bucket in plan:
                seg = min(seg, budget)
                if seg <= 0 and budget <= 0:
                    break
                budget -= seg
                seg_lens.append(seg)
            if budget > 0:
                seg_lens.append(budget)
            if timing:
                _hard_sync(hit_full)
                tmark(f"fused replay x{len(seg_lens)}")
            pl.push_pending(tag, n, seg_lens, [counts])
            return frozen, hit_full, steps_total
        else:
            # replay: no intra-frame syncs; counts resolved next frame
            seg_lens = []
            counts_dev = []
            for seg, bucket in plan:
                seg = min(seg, budget)
                if seg <= 0 and budget <= 0:
                    break
                cur_state, steps_total = round_jit(
                    descriptors, cur_consts, cur_state, steps_total, seg
                )
                if seg > 0:
                    warm.note("round", width_now, seg)
                if timing:
                    _hard_sync(cur_state.t_min)
                    tmark(f"round w={width_now} (replay)")
                budget -= seg
                seg_lens.append(seg)
                counts_dev.append(active_count(cur_state))
                if _should_compact(width_now, bucket) and _compact_on():
                    if guard and not warm.have("bundle", width_now, bucket):
                        _submit_bundle_o(bucket)  # rebuilt plan, cold shape
                    else:
                        do_compact(bucket)
            if budget > 0:
                # safety tail: stragglers beyond last frame's profile
                cur_state, steps_total = round_jit(
                    descriptors, cur_consts, cur_state, steps_total, budget
                )
                seg_lens.append(budget)
                counts_dev.append(active_count(cur_state))
            pl.push_pending(tag, n, seg_lens, counts_dev)

        if idx is None:
            hit_full = cur_state.hit
            if record_frozen:
                frozen = freeze_mat_jit(cur_state)
        elif record_frozen:
            frozen, hit_full = scatter_frozen(frozen, hit_full, idx, cur_state)
        else:
            hit_full = scatter_hit(hit_full, idx, cur_state)
        frozen = unfreeze_mat_jit(frozen, cur_state)
        warm.note("trace", n)
        return frozen, hit_full, steps_total

    def _finalize_lanes(descriptors, scale, ro_k, rd_k, max_dst, frozen_k,
                        hit_k, steps_total, known_k=None, known_value_k=None,
                        values_known=False):
        """Build a TraversalResult for a gathered lane subset. Lanes with a
        carried leaf value (adaptive fill: ``known_k``) substitute it for
        the fetched one (their synthesized state has no valid pointer).
        ``values_known`` (static): EVERY hit lane's value is already in
        ``known_value_k`` (merge-carried fills + compact refined-lane
        fetches, see ``refine_values``) — finalize runs fetch-free."""
        prepared = eng.prep(descriptors)
        c = make_ray_consts(scale, ro_k, rd_k, max_dst)
        shell = eng.thaw(c, frozen_k, hit_k, stack_height)
        if values_known:
            return eng.finalize(prepared, c, shell, steps_total,
                                value_override=known_value_k)
        res = eng.finalize(prepared, c, shell, steps_total)
        if known_k is not None:
            res = res._replace(
                value=jnp.where(known_k & hit_k, known_value_k, res.value)
            )
        return res

    finalize_lanes = jax.jit(_finalize_lanes, static_argnums=(10,))

    def _refine_values(descriptors, scale, ro_r, rd_r, frozen_r):
        """Leaf values for the refined lanes' frozen records, fetched at
        the COMPACT refine width. With these scattered into the merge's
        carried-value plane, every hit lane's value is known and the
        full-frame finalize skips its per-lane value fetch (at 1080p:
        a ~131K-row fetch replaces a ~2M-row one, bit-identical)."""
        c = make_ray_consts(scale, ro_r, rd_r, jnp.float32(-1.0))
        return eng.frozen_values(descriptors, c, frozen_r)

    refine_values = jax.jit(_refine_values)

    hit_count = jax.jit(lambda hit: jnp.sum(hit))
    hit_order = jax.jit(
        lambda hit, size: compact_indices(hit, size),
        static_argnums=(1,),
    )
    gather_lanes = jax.jit(
        # one packed row gather instead of per-channel gather passes
        lambda idx, *arrays: _unpack_cols(_pack_cols(arrays)[idx], arrays)
    )

    scatter_bool = jax.jit(lambda base, idx, v: base.at[idx].set(v))

    def _combine_dense(rgb, alpha, hit, rd):
        shaded = jnp.concatenate([rgb, alpha[:, None]], axis=-1)
        img = jnp.where(hit[:, None], shaded, sky_color(rd))
        return img.reshape(height, width, 4)

    combine_dense = jax.jit(_combine_dense)

    # ---------------------------------------------------------------------
    # Adaptive ("thick rays", reference README.md:243-254) machinery:
    # trace a quarter-resolution grid, then fill interior pixels whose four
    # surrounding coarse samples hit the IDENTICAL leaf (same pp/idx/scale/
    # pos, i.e. leaf identity — no tunable epsilon) by intersecting each
    # pixel's own ray with that leaf analytically (exact), and re-trace only
    # the disagreement pixels at full resolution.
    # ---------------------------------------------------------------------
    Hc, Wc, _coarse_pidx, _up4_g, _sample_masks_g, _pick_g = (
        _coarse_grid_for(width, height))
    Bc = Hc * Wc

    coarse_rays = jax.jit(
        lambda ray_args: (lambda p: (p, *_pix_rays(p, ray_args)))(
            _coarse_pidx()
        )
    )

    def _make_frozen_merge(hi_w, hi_h, hi_ids_fn):
        """Frozen-level coplanar merge from a lo grid onto its hi grid.
        Level 1: hi = the pixel grid, lo = the half-res coarse grid.
        Level 2 (hierarchy): hi = the coarse grid, lo = quarter-res.
        ``hi_ids_fn() -> (Bhi,)`` global PIXEL ids of the hi lanes."""
        _Hlo, _Wlo, lo_in_hi_fn, up4_l, masks_l, pick_l = (
            _coarse_grid_for(hi_w, hi_h))

        def merge(descriptors, frozen_c, hit_c, scale, ray_args,
                  known_c=None, kval_c=None):
            """Expand the coarse pass over the full frame.

            A pixel is filled without tracing when its 4 cell corners hit the
            SAME RENDERED SURFACE: equal block value, face, leaf scale and face
            plane (coplanar leaves — voxel boundaries within a flat surface stay
            smooth). The fill is exact: the pixel's own ray intersects the
            shared plane, its leaf base is recovered by mantissa quantization
            (the traversal's own POP rounding), and the leaf value is carried
            from the corners so finalize needs no extra fetch. Returns
            (frozen_full, hit_full, known_value, refine_mask, refine_count)
            """
            from .traversal import _exp2_scale, f32_bits, make_ray_consts
            from .bits import bits_f32

            up4 = up4_l

            def same4(q):
                a00, a01, a10, a11 = up4(q)
                return a00, (a00 == a01) & (a00 == a10) & (a00 == a11)

            lane = hi_ids_fn()
            is_sample, ylast, xlast = masks_l()

            def pick_sample(a00, a01, a10, a11):
                return pick_l(ylast, xlast, a00, a01, a10, a11)

            # -- per-coarse-lane surface identity (value fetch + hit geometry) --
            cp = hi_ids_fn()[lo_in_hi_fn()]
            ro_c2, rd_c2 = _pix_rays(cp, ray_args)
            cc = make_ray_consts(scale, ro_c2, rd_c2, jnp.float32(-1.0))
            t_c, pp_c, idxscale_c, px_c, py_c, pz_c = frozen_c[:6]
            scale_c = (idxscale_c >> jnp.uint32(8)).astype(jnp.int32)
            idx_c = (idxscale_c & jnp.uint32(0xFF)).astype(jnp.int32)
            value_c = eng.frozen_values(descriptors, cc, frozen_c)
            if known_c is not None:
                # hierarchical lower level: analytically filled lanes carry
                # their value (their synthesized state has no valid pointer)
                value_c = jnp.where(known_c, kval_c, value_c)
            sexp2_c = _exp2_scale(scale_c)
            t2x_c = (px_c + sexp2_c) * cc.tcx - cc.tbx
            t2y_c = (py_c + sexp2_c) * cc.tcy - cc.tby
            t2z_c = (pz_c + sexp2_c) * cc.tcz - cc.tbz
            tcmin_c = jnp.maximum(jnp.maximum(t2x_c, t2y_c), t2z_c)
            # face AXIS (0/1/2) + the shared entry-plane coordinate on it
            on_x_c = tcmin_c == t2x_c
            on_y_c = (~on_x_c) & (tcmin_c == t2y_c)
            axis_c = jnp.where(on_x_c, 0, jnp.where(on_y_c, 1, 2))
            plane_c = jnp.where(
                on_x_c, px_c + sexp2_c,
                jnp.where(on_y_c, py_c + sexp2_c, pz_c + sexp2_c),
            )

            h00, h01, h10, h11 = up4(hit_c)
            hit4 = h00 & h01 & h10 & h11
            miss4 = ~(h00 | h01 | h10 | h11)

            value00, value_eq = same4(value_c)
            axis00, axis_eq = same4(axis_c)
            plane00, plane_eq = same4(plane_c)
            scale00, scale_eq = same4(scale_c)
            om00, om_eq = same4(cc.octant_mask)

            # own-ray constants (bit-identical ray derivation to the traversal)
            ro, rd = _pix_rays(lane, ray_args)
            c = make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
            om_ok = om_eq & (c.octant_mask == om00)

            # the pixel's own ray meets the shared plane at t_int
            sexp2 = _exp2_scale(scale00)
            tc_ax = jnp.where(axis00 == 0, c.tcx,
                              jnp.where(axis00 == 1, c.tcy, c.tcz))
            tb_ax = jnp.where(axis00 == 0, c.tbx,
                              jnp.where(axis00 == 1, c.tby, c.tbz))
            t_int = plane00 * tc_ax - tb_ax

            # hit point in mirrored [1,2) space -> leaf base by mantissa
            # quantization (face axis comes from the plane itself)
            def mcoord(roa, rda, mirror):
                h = roa + t_int * rda
                return jnp.where(mirror, 3.0 - h, h)

            mx = mcoord(c.rox, c.rdx, c.mirror_x)
            my = mcoord(c.roy, c.rdy, c.mirror_y)
            mz = mcoord(c.roz, c.rdz, c.mirror_z)
            sc = jnp.clip(scale00, 0, 31).astype(jnp.uint32)

            def quant(m):
                return bits_f32((f32_bits(m) >> sc) << sc)

            base_ax = plane00 - sexp2
            posx = jnp.where(axis00 == 0, base_ax, quant(mx))
            posy = jnp.where(axis00 == 1, base_ax, quant(my))
            posz = jnp.where(axis00 == 2, base_ax, quant(mz))

            # consistency: the plane must be the pixel's own entry face of the
            # synthesized leaf box (finalize recomputes the same argmax)
            t2x = (posx + sexp2) * c.tcx - c.tbx
            t2y = (posy + sexp2) * c.tcy - c.tby
            t2z = (posz + sexp2) * c.tcz - c.tbz
            tcmin = jnp.maximum(jnp.maximum(t2x, t2y), t2z)
            on_x = tcmin == t2x
            on_y = (~on_x) & (tcmin == t2y)
            axis_own = jnp.where(on_x, 0, jnp.where(on_y, 1, 2))
            t_cube_exit = jnp.minimum(
                jnp.minimum(c.tcx - c.tbx, c.tcy - c.tby), c.tcz - c.tbz
            )
            smooth = (
                hit4 & value_eq & axis_eq & plane_eq & scale_eq & om_ok
                & (axis_own == axis00) & (t_int == tcmin)
                & (t_int > 0) & (t_int <= t_cube_exit)
            )

            hit_full = jnp.where(is_sample, pick_sample(h00, h01, h10, h11),
                                 smooth)
            refine = ~is_sample & ~smooth & ~miss4

            # frozen channels: samples keep their coarse state; smooth lanes get
            # the synthesized state (pp unused - value is carried)
            outs = []
            zero_u = jnp.zeros((), jnp.uint32)
            smooth_vals = [
                t_int, zero_u,
                scale00.astype(jnp.uint32) << jnp.uint32(8),
                posx, posy, posz,
            ] + [jnp.zeros((), a.dtype) for a in frozen_c[6:]]
            for a, sv in zip(frozen_c, smooth_vals):
                a00, a01, a10, a11 = up4(a)
                samp = pick_sample(a00, a01, a10, a11)
                zero = jnp.zeros((), samp.dtype)
                outs.append(
                    jnp.where(is_sample, samp, jnp.where(smooth, sv, zero))
                )

            # carried leaf values: samples + smooth lanes skip finalize's fetch
            v00, v01, v10, v11 = up4(value_c)
            known_value = jnp.where(
                is_sample, pick_sample(v00, v01, v10, v11),
                jnp.where(smooth, value00, 0),
            )
            known = hit_full & ~refine
            return (tuple(outs), hit_full, known, known_value, refine,
                    jnp.sum(refine).astype(jnp.int32))

        return jax.jit(merge)

    adaptive_merge = _make_frozen_merge(
        width, height,
        lambda: jnp.arange(width * height, dtype=jnp.int32),
    )
    # hierarchical level 2: quarter-res grid merged onto the coarse grid
    adaptive_merge_q = _make_frozen_merge(Wc, Hc, _coarse_pidx)
    _Hq, _Wq, _q_in_c, _u4q, _smq, _pkq = _coarse_grid_for(Wc, Hc)
    coarse_rays_q = jax.jit(
        lambda ray_args: (lambda p: (p, *_pix_rays(p, ray_args)))(
            _coarse_pidx()[_q_in_c()]
        )
    )
    coarse_sub_ids = jax.jit(lambda idx, ray_args: (
        lambda p: (p, *_pix_rays(p, ray_args)))(_coarse_pidx()[idx]))

    # hierarchical level 3 (VOXELRS_HIERARCHY=2): eighth-res grid merged
    # onto the quarter grid — the same frozen-merge recursion one level up
    def _q_ids():
        return _coarse_pidx()[_q_in_c()]

    adaptive_merge_e = _make_frozen_merge(_Wq, _Hq, _q_ids)
    _He, _We, _e_in_q, _u4e, _sme, _pke = _coarse_grid_for(_Wq, _Hq)
    coarse_rays_e = jax.jit(
        lambda ray_args: (lambda p: (p, *_pix_rays(p, ray_args)))(
            _q_ids()[_e_in_q()]
        )
    )
    quarter_sub_ids = jax.jit(lambda idx, ray_args: (
        lambda p: (p, *_pix_rays(p, ray_args)))(_q_ids()[idx]))
    Bq = _Hq * _Wq

    refine_order = jax.jit(
        lambda mask, size: compact_indices(mask, size),
        static_argnums=(1,),
    )

    def _merge_refined(frozen_full, hit_full, idx_r, frozen_r, hit_r):
        # one row scatter over the packed view instead of C channel passes
        mat = _pack_cols(frozen_full).at[idx_r].set(_pack_cols(frozen_r))
        return (_unpack_cols(mat, frozen_full),
                hit_full.at[idx_r].set(hit_r))

    merge_refined = jax.jit(_merge_refined, donate_argnums=(0, 1))

    # -- two-pass shadow reuse within the fine pass (full-width frames) ----
    # Pass 1 traces only coarse-sample pixels' shadow rays (their own exact
    # rays — bit-identical to the single-pass render); interior pixels whose
    # 4 cell corners agree on (need, blocked) reuse the verdict; pass 2
    # traces the disagreeing remainder (shadow edges, texel-noise lanes).
    shadow_mask1 = jax.jit(lambda need: need & _sample_masks_g()[0])

    def _shadow_cell_merge(need, blocked1):
        """Corner-agreement reuse for interior pixels. Returns
        (mask2 = lanes still needing a ray, reuse, verdict)."""

        def to_coarse(a):
            g = a.reshape(height, width)
            g = jnp.concatenate([g[::2], g[height - 1:]], axis=0)[:Hc]
            g = jnp.concatenate([g[:, ::2], g[:, width - 1:]], axis=1)[:, :Wc]
            return g.reshape(-1)

        n00, n01, n10, n11 = _up4_g(to_coarse(need))
        b00, b01, b10, b11 = _up4_g(to_coarse(blocked1))
        agree = ((n00 == n01) & (n00 == n10) & (n00 == n11)
                 & (b00 == b01) & (b00 == b10) & (b00 == b11))
        is_sample = _sample_masks_g()[0]
        reuse = ~is_sample & agree & n00  # verdict exists only where needed
        mask2 = need & ~is_sample & ~reuse
        return mask2, reuse, b00

    shadow_cell_merge = jax.jit(_shadow_cell_merge)
    shadow_combine = jax.jit(
        lambda reuse, verdict, blocked: jnp.where(reuse, verdict, blocked)
    )

    _pipeline_cache[key] = (trace, finalize_lanes, hit_count, hit_order,
                            gather_lanes, pix_rays_jit, store, scatter_bool,
                            combine_dense, coarse_rays, adaptive_merge,
                            refine_order, merge_refined, shadow_mask1,
                            shadow_cell_merge, shadow_combine,
                            adaptive_merge_q, coarse_rays_q, coarse_sub_ids,
                            Bc, refine_values, adaptive_merge_e,
                            coarse_rays_e, quarter_sub_ids, Bq)
    return _pipeline_cache[key]


def _deferred_pipeline(B: int, width: int, height: int, render_shadows: bool,
                       max_steps: int, rounds: int, stack_height: int = 12,
                       engine: str = "esvo"):
    """Build (raygen, trace, shade, combine) jitted stages for a pixel count."""
    key = (B, width, height, render_shadows, max_steps, rounds, stack_height,
           engine)
    if key in _pipeline_cache:
        return _pipeline_cache[key]

    from .traversal import _NO_VALUE, make_ray_consts

    eng = _ENGINES[engine]

    raygen = jax.jit(
        lambda cam_pos, cam_right, cam_up, cam_fwd, fov, aspect: generate_rays(
            width, height, cam_pos, cam_right, cam_up, cam_fwd, fov, aspect
        )
    )

    start = jax.jit(
        lambda descriptors, scale, ro, rd, max_dst: eng.start(
            descriptors, scale, ro, rd, max_dst, stack_height
        )
    )
    start_floored = jax.jit(
        lambda descriptors, scale, ro, rd, max_dst, tf: eng.start_floored(
            descriptors, scale, ro, rd, max_dst, stack_height, tf
        )
    )

    import os as _os

    _substeps = int(_os.environ.get("VOXELRS_SUBSTEPS", "4"))

    def round_body(descriptors, consts, state, steps_total, acc, done,
                   mips, mat_tex, seg_steps, fresh=False):
        """One deferred round: run the loop to the next leaf hits, judge
        texel alpha + adjacency, record accepted hits, resume the rest.

        ``fresh`` (static): every lane entering this round is in its
        pre-first-judge state (adjacency 0, no suppress/resume) — true for
        the FIRST nonzero segment of any trace, where all lanes come
        straight from start()/restart() with untouched bookkeeping. The
        loop then runs with the slim opaque carries, which are
        bit-identical for fresh lanes (the translucency bookkeeping only
        diverges after a resume): the in-loop adjacency/miss updates are
        no-ops on zeroed state, and the judge below reads the same zeros.
        This removes ~6 lane-word rewrites per substep from the one
        full-width segment that dominates the judged frame."""
        from .traversal import _exp2_scale

        if seg_steps == 0:
            # zero-length round: beam-floored traces prepend one so the
            # plan's first compaction can drop certain-miss lanes before
            # any traversal work
            return state, steps_total, acc, done

        prepared = eng.prep(descriptors)
        steps, state = eng.run_loop(prepared, consts, state, seg_steps,
                                    _substeps, opaque=fresh)
        steps_total = steps_total + steps

        res = eng.finalize(prepared, consts, state, steps_total)
        adj_count = (state.adj_last >> 24).astype(jnp.int32)
        last_value = state.adj_last & _NO_VALUE
        adj_count = jnp.where(state.missed, 0, adj_count)
        last_value = jnp.where(state.missed, _NO_VALUE, last_value)

        alpha_fn = make_alpha_fn(mips, mat_tex)
        judge = state.hit & ~done
        alpha = alpha_fn(res.value, res.face_id, res.uv, res.lod)
        first = (adj_count == 0) | ((res.value & _NO_VALUE) != last_value)
        accept = judge & (alpha > 0) & first
        resume = judge & ~accept

        # accepted surface identity for the adaptive fill: leaf scale + the
        # un-mirrored entry-plane coordinate in [1,2) h-space (exact — all
        # quantities are multiples of the leaf size)
        sexp2 = _exp2_scale(state.scale)
        axis = res.face_id >> 1
        plane_m = jnp.where(
            axis == 0, state.posx,
            jnp.where(axis == 1, state.posy, state.posz),
        ) + sexp2
        mirror_ax = jnp.where(
            axis == 0, consts.mirror_x,
            jnp.where(axis == 1, consts.mirror_y, consts.mirror_z),
        )
        plane_h = jnp.where(mirror_ax, 3.0 - plane_m, plane_m)

        (acc_t, acc_value, acc_face, acc_pos, acc_uv, acc_lod, acc_scale,
         acc_plane, acc_passed) = acc
        acc = (
            jnp.where(accept, res.t, acc_t),
            jnp.where(accept, res.value, acc_value),
            jnp.where(accept, res.face_id, acc_face),
            jnp.where(accept[:, None], res.pos, acc_pos),
            jnp.where(accept[:, None], res.uv, acc_uv),
            jnp.where(accept, res.lod, acc_lod),
            jnp.where(accept, state.scale, acc_scale),
            jnp.where(accept, plane_h, acc_plane),
            acc_passed | resume,
        )
        done = done | accept

        adj_count = jnp.where(resume, jnp.minimum(adj_count + 1, 255), adj_count)
        last_value = jnp.where(resume, res.value & _NO_VALUE, last_value)
        state = state._replace(
            active=state.active | resume,
            hit=state.hit & ~resume,
            adj_last=(adj_count.astype(jnp.uint32) << 24) | last_value,
            missed=jnp.zeros_like(state.missed),
            suppress=resume,
            floor=jnp.where(resume, state.t_min, state.floor),
        )
        return state, steps_total, acc, done

    round_jit = jax.jit(round_body, donate_argnums=(2, 4, 5),
                        static_argnums=(8, 9))

    # -- wavefront compaction: shrink to the unfinished-ray bucket ----------
    # Restart-based: the ESVO walk is memoryless given (ray, t_min), so
    # instead of gathering the whole traversal state (~80 lane-rows incl.
    # four stacks — measured ~1.2 us/lane, dwarfing the rounds it saved),
    # gather only the ray + resume bookkeeping (~12 rows) and re-descend
    # from the root at the old t_min. The ~depth extra pushes run at the
    # NEW narrow width and cost far less than the avoided gather.
    def _compact_fn(descriptors, scale, ro, rd, max_dst, state, acc, done,
                    gidx, sub_idx):
        ro_k = ro[gidx]
        rd_k = rd[gidx]
        md_k = max_dst if jnp.ndim(max_dst) == 0 else max_dst[gidx]
        sub_consts = make_ray_consts(scale, ro_k, rd_k, md_k)
        if _compact_packed_on() and state.active.shape[0] <= (1 << 17):
            from .traversal import gather_lane_state

            sub_state = gather_lane_state(state, sub_idx)
        else:
            sub_state = eng.restart(
                descriptors, sub_consts,
                t_floor=state.t_min[sub_idx],
                inside=state.inside[sub_idx],
                adj_last=state.adj_last[sub_idx],
                missed=state.missed[sub_idx],
                suppress=state.suppress[sub_idx],
                stack_height=stack_height,
            )
        sub_acc = _unpack_cols(_pack_cols(acc)[sub_idx], acc)
        return sub_consts, sub_state, sub_acc, done[sub_idx]

    compact_jit = jax.jit(_compact_fn)

    # full-width results live as ONE (n, 12+2) u32 matrix; each compaction
    # scatters the narrowed lanes' rows back in one row scatter (vs 14
    # channel-wise scatters — ~2x per probe)
    def _pack_full(acc, done, inside):
        return _pack_cols(tuple(acc) + (done, inside))

    def _scatter_fn(matF, idx, sub_acc, sub_done, sub_inside):
        return matF.at[idx].set(
            _pack_cols(tuple(sub_acc) + (sub_done, sub_inside)))

    pack_full_jit = jax.jit(_pack_full)
    scatter_jit = jax.jit(_scatter_fn, donate_argnums=(0,))

    unfinished_count = jax.jit(
        lambda state, done: jnp.sum(state.active | (state.hit & ~done))
    )
    # cumsum-based compaction indices (argsort is far more expensive);
    # fill_value 0 repeats a finished lane — harmless pad work
    order_unfinished = jax.jit(
        lambda state, done, size: compact_indices(
            state.active | (state.hit & ~done), size
        ),
        static_argnums=(2,),
    )

    # merge_none_below MUST stay 0 here: a judge runs only at segment
    # boundaries, so merging compaction-free segments (as the opaque
    # store does for dispatch latency) REMOVES judge opportunities — a
    # ray needing more accept/resume judgements than the merged plan
    # offers ends the trace hit-but-unjudged and renders as a miss
    # (found round 5: resolve()'s rebuild merged a cleared plan's
    # segments and a glass wall rendered as sky;
    # tests/test_render.py::test_rebuilt_plan_keeps_judges).
    store = _PlanStore(merge_none_below=0)
    warm = _ShapeWarm()
    store.warm = warm

    # fused replay: the whole recorded round/judge/compaction sequence as
    # one compiled program (see the opaque pipeline's _fused_replay)
    _fused_cache: dict = {}

    def _make_acc(n):
        return (
            jnp.full(n, -1.0, jnp.float32),
            jnp.zeros(n, jnp.uint32),
            jnp.zeros(n, jnp.int32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n, 2), jnp.float32),
            jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.int32),    # accepted leaf scale
            jnp.zeros(n, jnp.float32),  # accepted entry plane (h-space)
            jnp.zeros(n, bool),         # passed through a translucent texel
        )

    _unpack_templates = _make_acc(1) + (jnp.zeros(1, bool),
                                        jnp.zeros(1, bool))
    unpack_full_jit = jax.jit(
        lambda mat: _unpack_cols(mat, _unpack_templates))

    def _fused_replay_j(plan_key, floored=False):
        if (plan_key, floored) in _fused_cache:
            return _fused_cache[(plan_key, floored)]

        plan = list(plan_key)

        def fused(descriptors, scale, ro, rd, max_dst, mips, mat_tex,
                  t_floor=None):
            if floored:
                consts, state = eng.start_floored(
                    descriptors, scale, ro, rd, max_dst, stack_height,
                    t_floor)
            else:
                consts, state = eng.start(descriptors, scale, ro, rd,
                                          max_dst, stack_height)
            n = ro.shape[0]
            acc = _make_acc(n)
            done = jnp.zeros(n, bool)
            steps_total = jnp.int32(0)
            idx = None
            width_now = n
            counts = []
            budget = max_steps
            segs = list(plan)
            if sum(s for s, _ in plan) < max_steps:
                segs.append((max_steps - sum(s for s, _ in plan), None))
            fresh = _fresh_on()
            for seg, bucket in segs:
                seg = min(seg, budget)
                if seg <= 0 and budget <= 0:
                    break
                state, steps_total, acc, done = round_body(
                    descriptors, consts, state, steps_total, acc, done,
                    mips, mat_tex, seg, fresh,
                )
                if seg > 0:
                    fresh = False
                budget -= seg
                counts.append(
                    jnp.sum(state.active | (state.hit & ~done)).astype(
                        jnp.int32)
                )
                if _should_compact(width_now, bucket) and _compact_on():
                    sub_idx = compact_indices(
                        state.active | (state.hit & ~done), bucket
                    )
                    gidx = sub_idx if idx is None else idx[sub_idx]
                    nc, ns, na, nd = _compact_fn(
                        descriptors, scale, ro, rd, max_dst, state, acc,
                        done, gidx, sub_idx,
                    )
                    # scatter current results into the parents first
                    if idx is None:
                        matF = _pack_full(acc, done, state.inside)
                    else:
                        matF = _scatter_fn(matF, idx, acc, done,
                                           state.inside)
                    idx = gidx
                    consts, state, acc, done = nc, ns, na, nd
                    width_now = bucket
            if idx is None:
                matF = _pack_full(acc, done, state.inside)
            else:
                matF = _scatter_fn(matF, idx, acc, done, state.inside)
            unpacked = _unpack_cols(matF, _unpack_templates)
            accF, insideF = unpacked[:-2], unpacked[-1]
            from .traversal import TraversalResult

            res = TraversalResult(
                t=accF[0], value=accF[1], face_id=accF[2], pos=accF[3],
                uv=accF[4], lod=accF[5], inside_voxel=insideF,
                steps=jnp.broadcast_to(steps_total, (n,)), trace=None,
            )
            return res, accF[6], accF[7], accF[8], jnp.stack(counts)

        _fused_cache[(plan_key, floored)] = jax.jit(fused)
        return _fused_cache[(plan_key, floored)]

    def trace(descriptors, scale, ro, rd, max_dst, mips, mat_tex,
              tag="primary", t_floor=None, planner=None):
        pl_store = planner if planner is not None else store
        if t_floor is None:
            consts, state = start(descriptors, scale, ro, rd, max_dst)
        else:
            consts, state = start_floored(descriptors, scale, ro, rd,
                                          max_dst, t_floor)
            tag = (tag, "fl")
        n = ro.shape[0]
        acc = _make_acc(n)
        done = jnp.zeros(n, bool)
        steps_total = jnp.int32(0)

        import os

        # segments are push-engine ITERATIONS (one fetch + 3 substeps each,
        # i.e. up to ~2-3 reference steps of progress per iteration)
        seg0 = int(os.environ.get("VOXELRS_SEG", "16"))
        schedule = [seg0] * 5  # fine early grid: deep worlds need ~40+
        while sum(schedule) < max_steps:  # iterations at interesting widths
            schedule.append(min(schedule[-1] * 2, max_steps - sum(schedule)))
        if t_floor is not None:
            # zero-length first round: the first plan decision (certain
            # -miss lane drop) happens before any traversal iterations
            schedule = [0] + schedule

        timing = planner is None and os.environ.get("VOXELRS_TIMING") == "1"

        def tmark(label):
            if not timing:
                return
            import time as _t

            now = _t.perf_counter()
            print(f"      {label}: {(now - tmark.t0) * 1e3:.0f} ms", flush=True)
            tmark.t0 = now

        if timing:
            import time as _t

            _hard_sync(state)
            tmark.t0 = _t.perf_counter()

        plan = pl_store.lookup(tag, n)

        idx = None  # current lanes' indices into the full arrays
        matF = None  # packed full-width results (built at first compaction)
        cur_consts, cur_state, cur_acc, cur_done = consts, state, acc, done
        width_now = n

        def do_compact(bucket):
            nonlocal idx, cur_consts, cur_state, cur_acc, cur_done, width_now
            nonlocal matF
            warm.note("bundle", width_now, bucket)
            sub_idx = order_unfinished(cur_state, cur_done, bucket)
            gidx = sub_idx if idx is None else idx[sub_idx]
            new_consts, new_state, new_acc, new_done = compact_jit(
                descriptors, scale, ro, rd, max_dst, cur_state, cur_acc,
                cur_done, gidx, sub_idx,
            )
            # scatter current results into the parent before narrowing
            if idx is None:
                matF = pack_full_jit(cur_acc, cur_done, cur_state.inside)
            else:
                matF = scatter_jit(matF, idx, cur_acc, cur_done,
                                   cur_state.inside)
            idx = gidx
            cur_consts, cur_state, cur_acc, cur_done = (
                new_consts, new_state, new_acc, new_done
            )
            width_now = bucket
            if timing:
                _hard_sync(cur_state.t_min)
                tmark(f"compact->{bucket}")

        def _submit_bundle_j(bucket):
            """Background-AOT-warm the programs a compaction into
            ``bucket`` from ``width_now`` would need, then invalidate
            this tag's plan so the next recording takes the compaction
            at cache-load cost."""
            w = width_now
            st_av, acc_av, done_av, cons_av = _avals_at_width(
                (cur_state, cur_acc, cur_done, cur_consts), w, bucket)
            stw, accw, donew = cur_state, cur_acc, cur_done
            bidx = jax.ShapeDtypeStruct((bucket,), jnp.int32)
            seg_w = seg0
            thunks = [
                lambda: order_unfinished.lower(stw, donew, bucket).compile(),
                lambda: compact_jit.lower(
                    descriptors, scale, ro, rd, max_dst, stw, accw, donew,
                    bidx, bidx).compile(),
                lambda: round_jit.lower(
                    descriptors, cons_av, st_av, steps_total, acc_av,
                    done_av, mips, mat_tex, seg_w, False).compile(),
                lambda: unfinished_count.lower(st_av, done_av).compile(),
            ]
            warm.submit(("bundle", w, bucket), thunks,
                        on_done=lambda: store.invalidate(tag))

        budget = max_steps
        fresh = _fresh_on()
        # cold-shape guard (streaming p99): once the pipeline is past its
        # bootstrap frames, a stale-plan recording must never enter a
        # program shape that hasn't compiled yet — it keeps tracing at
        # the current width instead (correct, just wider) and the cold
        # bundle warms on the background AOT worker (see _ShapeWarm)
        guard = (_async_compile_on() and pl_store is store
                 and getattr(store, "_epoch", 0) >= 8)
        if plan is None:
            if guard:
                # seg0-sized rounds only: segmentation is semantically
                # free (judges between segments make identical
                # accept/resume decisions, just sooner), and it keeps the
                # shape set at ("round", width, seg0) which is warm by
                # construction
                schedule = [0] * (schedule[0] == 0) + [seg0] * (
                    -(-max_steps // seg0))
            plan_rec = []
            for seg_i, steps in enumerate(schedule):
                seg = min(steps, budget)
                cur_state, steps_total, cur_acc, cur_done = round_jit(
                    descriptors, cur_consts, cur_state, steps_total, cur_acc,
                    cur_done, mips, mat_tex, seg, fresh,
                )
                if seg > 0:
                    fresh = False
                    warm.note("round", width_now, seg)
                if timing:
                    _hard_sync(cur_state.t_min)
                    tmark(f"round w={width_now}")
                budget -= seg
                if budget <= 0:
                    plan_rec.append((seg, None))
                    break
                count = int(unfinished_count(cur_state, cur_done))
                tmark("count-sync")
                if timing:
                    print(f"    seg len={seg} width={width_now} "
                          f"unfinished={count}", flush=True)
                if count == 0:
                    plan_rec.append((seg, None))
                    break
                bucket = _sticky_bucket(pl_store.bucket_hint(tag, seg_i), count)
                if _should_compact(width_now, bucket) and _compact_on():
                    if guard and not warm.have("bundle", width_now, bucket):
                        # cold compaction shapes: stay at width, warm them
                        _submit_bundle_j(bucket)
                        plan_rec.append((seg, None))
                    else:
                        plan_rec.append((seg, bucket))
                        do_compact(bucket)
                else:
                    plan_rec.append((seg, None))
            pl_store.record(tag, n, plan_rec)
        elif _fused_replay_on() and (fused_entry := _fused_trace_entry(
                _fused_replay_j(tuple(plan), floored=t_floor is not None),
                (descriptors, scale, ro, rd, max_dst, mips, mat_tex)
                if t_floor is None else
                (descriptors, scale, ro, rd, max_dst, mips, mat_tex,
                 t_floor),
        )) is not None:
            fused_call, fargs = fused_entry
            res, sc, pl, ps, counts = fused_call(*fargs)
            seg_lens = []
            for seg, _bucket in plan:
                seg = min(seg, budget)
                if seg <= 0 and budget <= 0:
                    break
                budget -= seg
                seg_lens.append(seg)
            if budget > 0:
                seg_lens.append(budget)
            if timing:
                _hard_sync(res.t)
                tmark(f"fused replay x{len(seg_lens)}")
            pl_store.push_pending(tag, n, seg_lens, [counts])
            return res, sc, pl, ps
        else:
            seg_lens = []
            counts_dev = []
            for seg, bucket in plan:
                seg = min(seg, budget)
                if seg <= 0 and budget <= 0:
                    break
                cur_state, steps_total, cur_acc, cur_done = round_jit(
                    descriptors, cur_consts, cur_state, steps_total, cur_acc,
                    cur_done, mips, mat_tex, seg, fresh,
                )
                if seg > 0:
                    fresh = False
                    warm.note("round", width_now, seg)
                if timing:
                    _hard_sync(cur_state.t_min)
                    tmark(f"round w={width_now} (replay)")
                budget -= seg
                seg_lens.append(seg)
                counts_dev.append(unfinished_count(cur_state, cur_done))
                if _should_compact(width_now, bucket) and _compact_on():
                    if guard and not warm.have("bundle", width_now, bucket):
                        _submit_bundle_j(bucket)  # rebuilt plan, cold shape
                    else:
                        do_compact(bucket)
            if budget > 0:
                # safety tail: stragglers beyond last frame's profile get
                # the remaining budget (and one more alpha judgement)
                cur_state, steps_total, cur_acc, cur_done = round_jit(
                    descriptors, cur_consts, cur_state, steps_total, cur_acc,
                    cur_done, mips, mat_tex, budget, fresh,
                )
                seg_lens.append(budget)
                counts_dev.append(unfinished_count(cur_state, cur_done))
            pl_store.push_pending(tag, n, seg_lens, counts_dev)

        if idx is None:
            matF = pack_full_jit(cur_acc, cur_done, cur_state.inside)
        else:
            matF = scatter_jit(matF, idx, cur_acc, cur_done,
                               cur_state.inside)
        unpacked = unpack_full_jit(matF)
        acc, inside_full = unpacked[:-2], unpacked[-1]
        warm.note("trace", n)

        from .traversal import TraversalResult

        res = TraversalResult(
            t=acc[0], value=acc[1], face_id=acc[2], pos=acc[3], uv=acc[4],
            lod=acc[5], inside_voxel=inside_full,
            steps=jnp.broadcast_to(steps_total, (n,)), trace=None,
        )
        return res, acc[6], acc[7], acc[8]

    def shade(res_tuple, ro, rd, mips, mat_params, mat_tex, cam_pos, ambient,
              light_dir, shadow_distance, highlight_pos):
        from .traversal import TraversalResult

        res = TraversalResult(*res_tuple, steps=None, trace=None)
        hit = res.t != -1.0

        color, normal, diffuse, specular = surface_shading(
            res, mips, mat_params, mat_tex, cam_pos, light_dir, highlight_pos
        )

        # a shadow only matters when it can darken something:
        # light = ambient + (diffuse+specular)*shadow, so lanes with zero
        # diffuse+specular are exact skips
        need_shadow = hit & (res.t < shadow_distance) & (diffuse + specular > 0)
        shadow_ro = res.pos + normal * 0.001
        shadow_rd = jnp.broadcast_to(-light_dir, res.pos.shape)
        shadow_max = jnp.where(need_shadow, -1.0, 1e-35)
        return (color, diffuse, specular, hit, need_shadow, shadow_ro,
                shadow_rd, shadow_max)

    shade = jax.jit(shade)

    def combine(color, diffuse, specular, hit, need_shadow, shadow_t, rd,
                ambient):
        shadow = jnp.where(need_shadow, jnp.where(shadow_t < 0, 1.0, 0.0), 1.0)
        light = jnp.clip(ambient + (diffuse + specular) * shadow, 0.0, 1.0)
        rgb = color[:, :3] * light[:, None]
        shaded = jnp.concatenate([rgb, color[:, 3:4]], axis=-1)
        img = jnp.where(hit[:, None], shaded, sky_color(rd))
        return img.reshape(height, width, 4)

    combine = jax.jit(combine)

    # hit-lane compaction for the shade + shadow stages
    hit_count = jax.jit(lambda t: jnp.sum(t != -1.0))
    hit_order = jax.jit(
        lambda t, size: compact_indices(t != -1.0, size),
        static_argnums=(1,),
    )
    gather_lanes = jax.jit(
        # one packed row gather instead of per-channel gather passes
        lambda idx, *arrays: _unpack_cols(_pack_cols(arrays)[idx], arrays)
    )

    def combine_scatter(idx, rgb_k, alpha_k, hit, rd):
        img = sky_color(rd)
        shaded = jnp.concatenate([rgb_k, alpha_k[:, None]], axis=-1)
        img = img.at[idx].set(jnp.where(hit[idx][:, None], shaded, img[idx]))
        return img.reshape(height, width, 4)

    combine_scatter = jax.jit(combine_scatter)

    def finish_light(color_k, diffuse_k, specular_k, need_shadow_k, shadow_t_k,
                     ambient):
        shadow = jnp.where(need_shadow_k, jnp.where(shadow_t_k < 0, 1.0, 0.0), 1.0)
        light = jnp.clip(ambient + (diffuse_k + specular_k) * shadow, 0.0, 1.0)
        return color_k[:, :3] * light[:, None], color_k[:, 3]

    finish_light = jax.jit(finish_light)

    # -- adaptive (thick-ray) machinery for the judged pipeline ------------
    # Same scheme as the opaque path but at RESULT level: the coarse pass's
    # accepted surfaces (value, signed face, leaf scale, entry plane — the
    # identity survives translucent pass-throughs because only the ACCEPTED
    # hit is compared) fill interior pixels analytically; disagreements
    # re-trace through the full judged pipeline. ``_make_res_merge``
    # parametrizes the merge over (hi grid, lo grid) so the same machinery
    # stacks hierarchically (quarter grid fills the half grid fills the
    # pixel grid) exactly like the opaque pipeline's _make_frozen_merge.
    Hc, Wc, _coarse_pidx, _up4, _sample_masks, _pick = _coarse_grid_for(
        width, height
    )
    pix_rays_j = jax.jit(_pix_rays_for(width, height))
    coarse_rays_j = jax.jit(
        lambda ray_args: (lambda p: (p, *_pix_rays_for(width, height)(
            p, ray_args)))(_coarse_pidx())
    )

    def _make_res_merge(hi_w, hi_h, hi_ids_fn):
        """Result-level coplanar merge from the lo grid onto its hi grid.
        ``hi_ids_fn() -> (Bhi,)`` global PIXEL ids of the hi lanes (the
        pixel-grid instance passes arange; the half-grid instance passes
        the coarse pixel ids). Returns the merged result tuple PLUS the
        hi-level surface identity (scale, plane, passed) so the output can
        feed the next merge level."""
        _Hlo, _Wlo, _lo_in_hi, up4_l, masks_l, pick_l = _coarse_grid_for(
            hi_w, hi_h)

        def merge(res_c, scale_c, plane_c, passed_c, inside_c,
                  scale, ray_args, mips, mat_tex, hole_fill=True):
            from .bits import EPSILON, bits_f32
            from .traversal import (
                _exp2_scale,
                _hit_geometry,
                f32_bits,
                make_ray_consts,
            )
            _up4 = up4_l
            _sample_masks = masks_l
            _pick = pick_l

            t_c, value_c, face_c, pos_c, uv_c, lod_c = res_c
            hit_c = t_c != -1.0

            def same4(q):
                a00, a01, a10, a11 = _up4(q)
                return a00, (a00 == a01) & (a00 == a10) & (a00 == a11)

            h00, h01, h10, h11 = _up4(hit_c)
            hit4 = h00 & h01 & h10 & h11
            miss4 = ~(h00 | h01 | h10 | h11)
            value00, value_eq = same4(value_c)
            face00, face_eq = same4(face_c)
            scale00, scale_eq = same4(scale_c)
            plane00, plane_eq = same4(plane_c)

            # translucency guards: a cell is only fillable when (a) no
            # corner ray passed through a translucent texel on the way to
            # its accepted surface (the interior ray could clip an opaque
            # texel of that block — e.g. a glass frame), and (b) the
            # accepted surface's own textures have no alpha-0 texel (the
            # fill's texel may land on such a HOLE, where the true render
            # would pass through — e.g. leaves). Partial alpha in (0,1] is
            # fine: the traced judge accepts any alpha > 0 texel, so a
            # hole-free surface (e.g. water, uniform 0.65) fills exactly
            # like an opaque one.
            p00, p01, p10, p11 = _up4(passed_c)
            no_pass = ~(p00 | p01 | p10 | p11)
            T = mips[0].shape[0]
            V = mat_tex.shape[0]
            # per-LEVEL hole table (mip-aware, matching the judge's
            # NEAREST-mip alpha): a cell fills when the level its pixels'
            # tex_lod rounds to has no alpha-0 texel for the surface's
            # face textures — the traced judge at that lod would accept
            # every texel. Distant canopy (lod >= 1, box-averaged alpha)
            # becomes fillable through this tiny (V, L) table instead of
            # the retired full-width per-pixel alpha gather.
            n_lv = len(mips)
            layer_hole_L = jnp.stack(
                [(m[..., 3] <= 0.0).any(axis=(1, 2)) for m in mips], axis=1)
            block_hole_L = layer_hole_L[
                jnp.clip(mat_tex[:, 0:3], 0, T - 1)
            ].any(axis=1)  # (V, L)
            vid = value00.astype(jnp.int32)

            is_sample, ylast, xlast = _sample_masks()
            lane = hi_ids_fn()
            ro, rd = _pix_rays_for(width, height)(lane, ray_args)
            c = make_ray_consts(scale, ro, rd, jnp.float32(-1.0))

            axis00 = face00 >> 1
            sexp2 = _exp2_scale(scale00)
            sx = (f32_bits(c.rdx) >> jnp.uint32(31)).astype(jnp.int32)
            sy = (f32_bits(c.rdy) >> jnp.uint32(31)).astype(jnp.int32)
            sz = (f32_bits(c.rdz) >> jnp.uint32(31)).astype(jnp.int32)
            own_sign_ax = jnp.where(axis00 == 0, sx,
                                    jnp.where(axis00 == 1, sy, sz))
            sign_ok = own_sign_ax == (face00 & 1)

            mirror_ax = jnp.where(
                axis00 == 0, c.mirror_x,
                jnp.where(axis00 == 1, c.mirror_y, c.mirror_z),
            )
            plane_m = jnp.where(mirror_ax, 3.0 - plane00, plane00)
            tc_ax = jnp.where(axis00 == 0, c.tcx,
                              jnp.where(axis00 == 1, c.tcy, c.tcz))
            tb_ax = jnp.where(axis00 == 0, c.tbx,
                              jnp.where(axis00 == 1, c.tby, c.tbz))
            t_int = plane_m * tc_ax - tb_ax

            def mcoord(roa, rda, mirror):
                h = roa + t_int * rda
                return jnp.where(mirror, 3.0 - h, h)

            sc = jnp.clip(scale00, 0, 31).astype(jnp.uint32)

            def quant(m):
                return bits_f32((f32_bits(m) >> sc) << sc)

            base_ax = plane_m - sexp2
            posx = jnp.where(axis00 == 0, base_ax,
                             quant(mcoord(c.rox, c.rdx, c.mirror_x)))
            posy = jnp.where(axis00 == 1, base_ax,
                             quant(mcoord(c.roy, c.rdy, c.mirror_y)))
            posz = jnp.where(axis00 == 2, base_ax,
                             quant(mcoord(c.roz, c.rdz, c.mirror_z)))

            t2x = (posx + sexp2) * c.tcx - c.tbx
            t2y = (posy + sexp2) * c.tcy - c.tby
            t2z = (posz + sexp2) * c.tcz - c.tbz
            tcmin = jnp.maximum(jnp.maximum(t2x, t2y), t2z)
            on_x = tcmin == t2x
            on_y = (~on_x) & (tcmin == t2y)
            face_own = jnp.where(on_x, sx, jnp.where(on_y, 2 | sy, 4 | sz))
            t_cube_exit = jnp.minimum(
                jnp.minimum(c.tcx - c.tbx, c.tcy - c.tby), c.tcz - c.tbz
            )
            fillable = (
                hit4 & value_eq & face_eq & scale_eq & plane_eq & sign_ok
                & no_pass
                & (face_own == face00) & (t_int == tcmin)
                & (t_int > 0) & (t_int <= t_cube_exit)
            )

            face_g, ux, uy, dst, tex_lod, (upx, upy, upz) = _hit_geometry(
                c, 0, scale00, posx, posy, posz, t_int
            )

            # mip-aware fill validity (same level rounding as the judge)
            dl_cell = jnp.round(jnp.clip(tex_lod, 0.0, float(n_lv - 1))
                                ).astype(jnp.int32)
            hole_rows = small_lookup(block_hole_L.astype(jnp.int32), vid)
            hole_at = jnp.sum(
                jnp.where(dl_cell[:, None]
                          == jnp.arange(n_lv, dtype=jnp.int32)[None, :],
                          hole_rows, 0), axis=1)
            value_opaque = (vid < V) & (hole_at == 0)

            # HOLED surfaces (textures with alpha-0 texels, e.g. leaves):
            # judge the pixel's OWN texel on the shared plane with the
            # traced judge's exact sampler — alpha>0 pixels fill (what a
            # traced first-encounter accept of this surface records),
            # alpha==0 pixels pass through and re-trace. Same thick-ray
            # approximation class as the opaque fill; the full-width texel
            # gather costs far less than the judged re-trace of every
            # pixel of every leaf-canopy cell (VOXELRS_HOLE_FILL=0
            # disables).
            if hole_fill:
                alpha_px = make_alpha_fn(mips, mat_tex)(
                    value00, face00, jnp.stack([ux, uy], -1), tex_lod)
                smooth = fillable & (value_opaque | (alpha_px > 0.0))
            else:
                smooth = fillable & value_opaque
            hx = jnp.clip(c.rox + t_int * c.rdx, upx + EPSILON,
                          upx + sexp2 - EPSILON)
            hy = jnp.clip(c.roy + t_int * c.rdy, upy + EPSILON,
                          upy + sexp2 - EPSILON)
            hz = jnp.clip(c.roz + t_int * c.rdz, upz + EPSILON,
                          upz + sexp2 - EPSILON)
            pos_fill = (jnp.stack([hx, hy, hz], -1) - 1.0) / c.octree_scale

            samp = lambda *a4: _pick(ylast, xlast, *a4)  # noqa: E731
            hit_full = jnp.where(is_sample, samp(h00, h01, h10, h11), smooth)
            refine = ~is_sample & ~smooth & ~miss4

            def fill(coarse, fill_val, miss_val):
                a4 = _up4(coarse)
                s = samp(*a4)
                sm = smooth[:, None] if s.ndim == 2 else smooth
                is_s = is_sample[:, None] if s.ndim == 2 else is_sample
                return jnp.where(is_s, s, jnp.where(sm, fill_val, miss_val))

            out = (
                fill(t_c, dst, jnp.float32(-1.0)),
                fill(value_c, value00, jnp.uint32(0)),
                fill(face_c, face00, jnp.int32(0)),
                fill(pos_c, pos_fill, jnp.float32(0.0)),
                fill(uv_c, jnp.stack([ux, uy], -1), jnp.float32(0.0)),
                fill(lod_c, tex_lod, jnp.float32(0.0)),
            )
            inside_full = jnp.where(is_sample, samp(*_up4(inside_c)), False)
            # hi-level surface identity for the NEXT merge level: filled
            # lanes carry the shared surface (coplanarity makes their own
            # entry-plane coordinate equal plane00; no_pass + hole-free
            # textures make passed False — what a traced accept of the
            # same surface records)
            scale_full = fill(scale_c, scale00, jnp.int32(0))
            plane_full = fill(plane_c, plane00, jnp.float32(0.0))
            passed_full = jnp.where(is_sample, samp(p00, p01, p10, p11),
                                    False)
            return (out, hit_full, inside_full, scale_full, plane_full,
                    passed_full, refine, jnp.sum(refine).astype(jnp.int32))

        return jax.jit(merge, static_argnums=(9,))

    adaptive_merge_j = _make_res_merge(
        width, height, lambda: jnp.arange(width * height, dtype=jnp.int32))
    # hierarchical level 2 (judged): quarter-res results fill the half grid
    adaptive_merge_jq = _make_res_merge(Wc, Hc, _coarse_pidx)
    _Hqj, _Wqj, _q_in_c_j, _u4qj, _smqj, _pkqj = _coarse_grid_for(Wc, Hc)
    quarter_rays_j = jax.jit(
        lambda ray_args: (lambda p: (p, *_pix_rays_for(width, height)(
            p, ray_args)))(_coarse_pidx()[_q_in_c_j()])
    )
    coarse_sub_ids_j = jax.jit(lambda idx, ray_args: (
        lambda p: (p, *_pix_rays_for(width, height)(p, ray_args)))(
            _coarse_pidx()[idx]))
    Bq_j = _Hqj * _Wqj

    refine_order_j = jax.jit(
        lambda mask, size: compact_indices(mask, size),
        static_argnums=(1,),
    )

    def _merge_refined_res(res_full, hit_full, inside_full, idx_r, res_r,
                           inside_r):
        full = tuple(res_full) + (hit_full, inside_full)
        sub = tuple(res_r) + (res_r[0] != -1.0, inside_r)
        mat = _pack_cols(full).at[idx_r].set(_pack_cols(sub))
        out = _unpack_cols(mat, full)
        return out[:-2], out[-2], out[-1]

    merge_refined_res = jax.jit(_merge_refined_res, donate_argnums=(0, 1, 2))

    def _merge_refined_res_full(res_full, inside_full, scale_full,
                                plane_full, passed_full, idx_r, res_r,
                                inside_r, scale_r, plane_r, passed_r):
        """Scatter hi-level refined lanes back, surface identity included
        (the quarter->half merge level feeds the half->full merge)."""
        full = tuple(res_full) + (inside_full, scale_full, plane_full,
                                  passed_full)
        sub = tuple(res_r) + (inside_r, scale_r, plane_r, passed_r)
        mat = _pack_cols(full).at[idx_r].set(_pack_cols(sub))
        out = _unpack_cols(mat, full)
        return out[:6], out[6], out[7], out[8], out[9]

    merge_refined_res_full = jax.jit(
        _merge_refined_res_full, donate_argnums=(0, 1, 2, 3, 4))

    _pipeline_cache[key] = (raygen, trace, shade, combine, hit_count,
                            hit_order, gather_lanes, combine_scatter,
                            finish_light, store, pix_rays_j, coarse_rays_j,
                            adaptive_merge_j, refine_order_j,
                            merge_refined_res, adaptive_merge_jq,
                            quarter_rays_j, coarse_sub_ids_j, Bq_j,
                            merge_refined_res_full, Hc * Wc)
    return _pipeline_cache[key]


def render_frame_deferred(descriptors, octree_scale, mips, mat_params,
                          mat_tex, *, width: int, height: int,
                          render_shadows: bool, cam_pos, cam_right, cam_up,
                          cam_fwd, fov_y_rad, aspect, ambient, light_dir,
                          shadow_distance, highlight_pos,
                          max_steps: int = 1000, rounds: int = 4,
                          opaque: bool = False, stack_height: int = 12,
                          engine: str = "esvo", beams=None,
                          prewarm_descriptors=None):
    """Host-orchestrated frame: raygen → deferred primary trace → shading →
    deferred shadow trace → composite. Same output as ``render_frame`` (up
    to the deferred-rounds bound on translucent pass-throughs).

    ``opaque=True`` (caller-verified: no texture texel with alpha < 1, so
    translucent casting degenerates to first-hit casting) uses the leaner
    pipeline: no per-round alpha judging, one finalize on hit lanes only,
    no shadow finalize."""
    import os
    import time

    timing = os.environ.get("VOXELRS_TIMING") == "1"

    def mark(name, ref):
        if timing:
            _hard_sync(ref)
            now = time.perf_counter()
            print(f"  [{name}] {(now - mark.t0)*1e3:.0f} ms", flush=True)
            mark.t0 = now

    mark.t0 = time.perf_counter()

    B = width * height

    if opaque:
        return _render_frame_opaque(
            descriptors, octree_scale, mips, mat_params, mat_tex,
            width=width, height=height, render_shadows=render_shadows,
            cam_pos=cam_pos, cam_right=cam_right, cam_up=cam_up,
            cam_fwd=cam_fwd, fov_y_rad=fov_y_rad, aspect=aspect,
            ambient=ambient, light_dir=light_dir,
            shadow_distance=shadow_distance, highlight_pos=highlight_pos,
            max_steps=max_steps, mark=mark, stack_height=stack_height,
            engine=engine, beams=beams,
            prewarm_descriptors=prewarm_descriptors,
        )

    _adaptive_env = os.environ.get("VOXELRS_ADAPTIVE")
    adaptive = (
        bool(int(_adaptive_env)) if _adaptive_env is not None
        else (B >= (1 << 18) and width > 4 and height > 4)
    )
    if adaptive:
        return _render_frame_judged_adaptive(
            descriptors, octree_scale, mips, mat_params, mat_tex,
            width=width, height=height, render_shadows=render_shadows,
            cam_pos=cam_pos, cam_right=cam_right, cam_up=cam_up,
            cam_fwd=cam_fwd, fov_y_rad=fov_y_rad, aspect=aspect,
            ambient=ambient, light_dir=light_dir,
            shadow_distance=shadow_distance, highlight_pos=highlight_pos,
            max_steps=max_steps, rounds=rounds, mark=mark,
            stack_height=stack_height, engine=engine, beams=beams,
            prewarm_descriptors=prewarm_descriptors,
        )

    (raygen, trace, shade, combine, hit_count, hit_order, gather_lanes,
     combine_scatter, finish_light, store, *_adap) = _deferred_pipeline(
        B, width, height, render_shadows, max_steps, rounds, stack_height,
        engine,
    )
    store.resolve()  # refresh replay plans from last frame's counts
    ro, rd = raygen(cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect)
    mark("raygen", rd)
    res, _sc, _pl, _ps = trace(descriptors, octree_scale, ro, rd,
                               jnp.float32(-1.0), mips, mat_tex,
                               tag="primary",
                               t_floor=None if beams is None
                               else beams.t_floor)
    mark("primary", res.t)

    # compact shading + shadows to the hit lanes
    k = store.sticky_sync("hits_k", int(hit_count(res.t)), B)
    idx = hit_order(res.t, k)
    (t_k, value_k, face_k, pos_k, uv_k, lod_k, ro_k, rd_k) = gather_lanes(
        idx, res.t, res.value, res.face_id, res.pos, res.uv, res.lod, ro, rd
    )
    mark("compact-hits", t_k)

    (color_k, diffuse_k, specular_k, hit_k, need_shadow_k, shadow_ro_k,
     shadow_rd_k, shadow_max_k) = shade(
        (t_k, value_k, face_k, pos_k, uv_k, lod_k, None), ro_k, rd_k, mips,
        mat_params, mat_tex, cam_pos, ambient, light_dir, shadow_distance,
        highlight_pos,
    )
    mark("shade", color_k)
    if render_shadows:
        tfl = None
        if beams is not None:
            tfl = beams.shadow_ray_floors(
                shadow_ro_k, shadow_max_k,
                -jnp.asarray(light_dir, jnp.float32))
        sres, _ssc, _spl, _sps = trace(descriptors, octree_scale,
                                       shadow_ro_k, shadow_rd_k,
                                       shadow_max_k, mips, mat_tex,
                                       tag=("shadow", k), t_floor=tfl)
        shadow_t_k = sres.t
        mark("shadow", shadow_t_k)
    else:
        shadow_t_k = jnp.full(k, -1.0, jnp.float32)
    rgb_k, alpha_k = finish_light(
        color_k, diffuse_k, specular_k, need_shadow_k, shadow_t_k, ambient
    )
    out = combine_scatter(idx, rgb_k, alpha_k, res.t != -1.0, rd)
    mark("combine", out)
    return out


_shadow_sign = None
_floor_gather = None


def _make_floor_gather():
    global _floor_gather
    _floor_gather = jax.jit(lambda tf, i: tf[i])


def _render_frame_judged_adaptive(descriptors, octree_scale, mips,
                                  mat_params, mat_tex, *, width, height,
                                  render_shadows, cam_pos, cam_right, cam_up,
                                  cam_fwd, fov_y_rad, aspect, ambient,
                                  light_dir, shadow_distance, highlight_pos,
                                  max_steps, rounds, mark, stack_height=12,
                                  engine="esvo", beams=None,
                                  prewarm_descriptors=None):
    """Adaptive thick-ray frame over the alpha-judged (translucent-capable)
    pipeline: quarter-res judged trace, result-level coplanar fill keyed on
    each pixel cell's ACCEPTED surface (value, signed face, leaf scale,
    entry plane), full judged re-trace of disagreement pixels, two-pass
    shadow cell reuse. The MC-world scenes (glass/water/leaves) render this
    way at large frame sizes. Under VOXELRS_FUSED_FRAME a fully-recorded
    frame runs as one XLA program (see _render_frame_opaque)."""
    B = width * height
    store = _deferred_pipeline(B, width, height, render_shadows, max_steps,
                               rounds, stack_height, engine)[9]
    store.resolve()
    mark("plan-refresh", jnp.zeros(1))

    kwargs = dict(
        width=width, height=height, render_shadows=render_shadows,
        max_steps=max_steps, rounds=rounds, stack_height=stack_height,
        engine=engine,
    )
    dev_args = (descriptors, octree_scale, mips, mat_params, mat_tex,
                cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect,
                ambient, light_dir, shadow_distance, highlight_pos, beams)

    if _fused_frame_on():
        import os as _os

        # VOXELRS_STAGE_CUT: same profiling-only truncation knob as the
        # opaque fused frame (see _render_frame_opaque) — attributes device
        # cost inside the ONE fused judged program
        cut = _os.environ.get("VOXELRS_STAGE_CUT")
        flags = ("jdg", width, height, render_shadows, max_steps, rounds,
                 stack_height, engine, beams is not None,
                 beams is not None and beams.has_sun(), cut,
                 _hole_fill_on())

        def body_fn(planner, *args):
            planner.reset()
            if not cut:
                img = _judged_frame_body(
                    *args[:15], beams=args[15], planner=planner,
                    mark=lambda *_a: None, **kwargs)
                return img, tuple(planner.arrays)

            box: list = []

            def cut_mark(name, ref):
                if str(name).startswith(cut):
                    box.append(ref)
                    raise _StageCut()

            try:
                img = _judged_frame_body(
                    *args[:15], beams=args[15], planner=planner,
                    mark=cut_mark, **kwargs)
            except _StageCut:
                anchor = _anchor_all(box[0])
                img = jnp.zeros((height, width, 4), jnp.float32) + anchor
            return img, tuple(planner.arrays)

        out = _fused_frame_call(store, flags, dev_args, body_fn,
                                prewarm_descriptors=prewarm_descriptors)
        if out is not None:
            mark("fused-frame", out)
            return out

    return _judged_frame_body(*dev_args[:15], beams=beams, planner=store,
                              mark=mark, **kwargs)


def _judged_frame_body(descriptors, octree_scale, mips, mat_params, mat_tex,
                       cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad,
                       aspect, ambient, light_dir, shadow_distance,
                       highlight_pos, *, width, height, render_shadows,
                       max_steps, rounds, planner, mark, stack_height=12,
                       engine="esvo", beams=None):
    """The judged-adaptive frame computation (see _opaque_frame_body for
    the planner contract)."""
    global _shadow_sign

    B = width * height
    (raygen, trace, shade, combine, hit_count, hit_order, gather_lanes,
     combine_scatter, finish_light, store, pix_rays_j, coarse_rays_j,
     adaptive_merge_j, refine_order_j, merge_refined_res,
     adaptive_merge_jq, quarter_rays_j, coarse_sub_ids_j, Bq_j,
     merge_refined_res_full, Bc_j) = (
        _deferred_pipeline(B, width, height, render_shadows, max_steps,
                           rounds, stack_height, engine))
    # shape-only helpers shared with the opaque pipeline (bool-mask order,
    # scatter, shadow cell merge)
    (_to, _fl, hit_count_b, hit_order_b, _glo, _pro, _so, scatter_bool,
     _cdo, _cro, _amo, _roo, _mro, shadow_mask1, shadow_cell_merge,
     shadow_combine, *_hier) = _opaque_pipeline(
        B, width, height, max_steps, stack_height, engine)
    fused = planner is not store
    tr_planner = planner if fused else None
    if _shadow_sign is None:
        _shadow_sign = jax.jit(lambda h: jnp.where(h, 1.0, -1.0))

    ray_args = (cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect)
    # profiling anchor: cut here = the fused program's fixed floor (launch
    # + arg landing + fence sync), everything downstream DCE'd
    _desc0 = jax.tree_util.tree_leaves(descriptors)[0]
    mark("args", cam_pos[0] + _desc0.ravel()[0].astype(jnp.float32))
    ro, rd = raygen(cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect)
    mark("raygen", rd)

    t_floor = beams.t_floor if beams is not None else None
    if _floor_gather is None:
        _make_floor_gather()

    def _flg(pix_idx):
        return None if t_floor is None else _floor_gather(t_floor, pix_idx)

    # hierarchical coarse level (VOXELRS_HIERARCHY, same knob as the
    # opaque pipeline, default on): trace the QUARTER grid, fill
    # same-surface half-grid lanes analytically, judged-re-trace the
    # disagreements — the flat half-res judged trace was the single
    # largest stage of the MC frame (+135 ms of 328 in-program ms,
    # scripts/probes/fused_stage_cut_mc.py)
    import os as _os

    _hier_env = _os.environ.get("VOXELRS_HIERARCHY")
    try:
        _hier_levels = int(_hier_env) if _hier_env else 1
    except ValueError:
        _hier_levels = 1
    if _hier_levels >= 1 and Bq_j >= 4096:
        qpix, ro_q, rd_q = quarter_rays_j(ray_args)
        res_q, scale_q, plane_q, passed_q = trace(
            descriptors, octree_scale, ro_q, rd_q, jnp.float32(-1.0), mips,
            mat_tex, tag="coarse4j", t_floor=_flg(qpix), planner=tr_planner,
        )
        mark("coarse4j", (res_q, scale_q, plane_q, passed_q))
        (resc, hit_c, inside_c, scale_c, plane_c, passed_c, refq_mask,
         refq_count) = adaptive_merge_jq(
            (res_q.t, res_q.value, res_q.face_id, res_q.pos, res_q.uv,
             res_q.lod), scale_q, plane_q, passed_q, res_q.inside_voxel,
            octree_scale, ray_args, mips, mat_tex, _hole_fill_on(),
        )
        k_rq = planner.sticky_scalar("jqrefine_k", refq_count, Bc_j)
        idx_rq = refine_order_j(refq_mask, k_rq)
        qsub, ro_rq, rd_rq = coarse_sub_ids_j(idx_rq, ray_args)
        res_rq, sc_rq, pl_rq, ps_rq = trace(
            descriptors, octree_scale, ro_rq, rd_rq, jnp.float32(-1.0),
            mips, mat_tex, tag=("jqrefine", k_rq), t_floor=_flg(qsub),
            planner=tr_planner,
        )
        resc, inside_c, scale_c, plane_c, passed_c = merge_refined_res_full(
            resc, inside_c, scale_c, plane_c, passed_c, idx_rq,
            (res_rq.t, res_rq.value, res_rq.face_id, res_rq.pos, res_rq.uv,
             res_rq.lod), res_rq.inside_voxel, sc_rq, pl_rq, ps_rq,
        )
        res_c_tuple = resc
        inside_c_arr = inside_c
        mark("coarse", (res_c_tuple, inside_c_arr, scale_c, plane_c,
                        passed_c))
    else:
        cpidx, ro_c, rd_c = coarse_rays_j(ray_args)
        res_c, scale_c, plane_c, passed_c = trace(
            descriptors, octree_scale, ro_c, rd_c, jnp.float32(-1.0), mips,
            mat_tex, tag="coarse", t_floor=_flg(cpidx), planner=tr_planner,
        )
        res_c_tuple = (res_c.t, res_c.value, res_c.face_id, res_c.pos,
                       res_c.uv, res_c.lod)
        inside_c_arr = res_c.inside_voxel
        mark("coarse", (res_c_tuple, inside_c_arr, scale_c, plane_c,
                        passed_c))

    (resf, hit, inside_full, _scf, _plf, _psf, refine_mask,
     refine_count) = adaptive_merge_j(
        res_c_tuple, scale_c, plane_c, passed_c, inside_c_arr,
        octree_scale, ray_args, mips, mat_tex, _hole_fill_on(),
    )
    mark("adaptive-merge", (resf, hit, inside_full, refine_mask,
                            refine_count))

    k_r = planner.sticky_scalar("refine_k", refine_count, B)
    idx_r = refine_order_j(refine_mask, k_r)
    ro_r, rd_r = pix_rays_j(idx_r, ray_args)
    res_r, _sc_r, _pl_r, _ps_r = trace(
        descriptors, octree_scale, ro_r, rd_r, jnp.float32(-1.0), mips,
        mat_tex, tag=("refine", k_r),
        t_floor=None if t_floor is None else _floor_gather(t_floor, idx_r),
        planner=tr_planner,
    )
    resf, hit, inside_full = merge_refined_res(
        resf, hit, inside_full, idx_r,
        (res_r.t, res_r.value, res_r.face_id, res_r.pos, res_r.uv,
         res_r.lod), res_r.inside_voxel,
    )
    mark("refine", (resf, hit, inside_full))

    t_f, value_f, face_f, pos_f, uv_f, lod_f = resf
    k = planner.sticky_scalar("hits_k", hit_count(t_f), B)
    if k >= B // 3:
        k = B
        idx = None
        res_k = resf
        ro_k, rd_k = ro, rd
    else:
        idx = hit_order(t_f, k)
        res_k = gather_lanes(idx, *resf)
        ro_k, rd_k = pix_rays_j(idx, ray_args)
    mark("compact-hits", (res_k, ro_k, rd_k))

    def _shade_at(sl):
        return shade(
            (res_k[0][sl], res_k[1][sl], res_k[2][sl], res_k[3][sl],
             res_k[4][sl], res_k[5][sl], None),
            ro_k[sl], rd_k[sl], mips, mat_params, mat_tex, cam_pos, ambient,
            light_dir, shadow_distance, highlight_pos,
        )

    if k > 1_600_000:
        half = k // 2
        pa = _shade_at(slice(0, half))
        pb = _shade_at(slice(half, k))
        (color_k, diffuse_k, specular_k, _hk, need_shadow_k, shadow_ro_k,
         shadow_rd_k, shadow_max_k) = tuple(
            jnp.concatenate([a, b]) for a, b in zip(pa, pb)
        )
    else:
        (color_k, diffuse_k, specular_k, _hk, need_shadow_k, shadow_ro_k,
         shadow_rd_k, shadow_max_k) = _shade_at(slice(0, k))
    mark("shade", (color_k, diffuse_k, specular_k, need_shadow_k,
                   shadow_ro_k, shadow_rd_k, shadow_max_k))

    if render_shadows:
        # sun-map certificate elision on the CANDIDATE BUCKET (see the
        # opaque pipeline's shadow_trace): certified lanes (provably lit
        # OR provably blocked) skip the trace; a certificate equals the
        # trace's verdict, so output is bit-identical. Verdicts are
        # gathered per candidate lane, never at full frame width (the
        # full-width verdict gather cost ~205 ms/frame, round-3 audit).
        has_sun = beams is not None and beams.has_sun()
        _sun_ready = _make_sun_ready(store, tr_planner, beams)

        def shadow_trace(mask, name):
            cnt = hit_count_b(mask)
            kc = planner.sticky_scalar(name, cnt, k)
            sidx = hit_order_b(mask, kc)
            sro2, srd2, smax2 = gather_lanes(sidx, shadow_ro_k, shadow_rd_k,
                                             shadow_max_k)
            mark(f"shadow-bucket {name}={kc}", sro2)
            if has_sun and _sun_ready(kc):
                lit2, blk2 = beams.sun_verdicts(sro2, smax2)
                mark(f"sun-verdicts {name}", lit2)
                un = _mask_pads(_uncertified(lit2, blk2), cnt)
                kt = planner.sticky_scalar(name + "t", hit_count_b(un), kc)
                tidx = hit_order_b(un, kt)
                sro3, srd3, smax3 = gather_lanes(tidx, sro2, srd2, smax2)
                sres, _a, _b, _c2 = trace(
                    descriptors, octree_scale, sro3, srd3, smax3, mips,
                    mat_tex, tag=(name, kt), planner=tr_planner,
                )
                # pad lanes duplicate global lane 0 - value-identical
                # writes (certificate == traced verdict)
                blocked2 = _or_scatter(blk2, tidx, sres.t != -1.0)
                mark(f"shadow-trace {name}", blocked2)
                return sidx, blocked2
            tfl = None
            if beams is not None:
                tfl = beams.shadow_ray_floors(
                    sro2, smax2, -jnp.asarray(light_dir, jnp.float32),
                    prefer_envelope=has_sun)
            sres, _a, _b, _c2 = trace(
                descriptors, octree_scale, sro2, srd2, smax2, mips, mat_tex,
                tag=(name, kc), t_floor=tfl, planner=tr_planner,
            )
            mark(f"shadow-trace {name}", sres.t)
            return sidx, sres.t != -1.0

        blk0 = jnp.zeros(k, bool)
        if idx is None:
            sidx1, shit1 = shadow_trace(shadow_mask1(need_shadow_k),
                                        "jns1_k")
            blocked = _or_scatter(blk0, sidx1, shit1)
            mask2, reuse, verdict = shadow_cell_merge(need_shadow_k, blocked)
            sidx2, shit2 = shadow_trace(mask2, "jns2_k")
            blocked = _or_scatter(blocked, sidx2, shit2)
            blocked = shadow_combine(reuse, verdict, blocked)
        else:
            sidx, shit = shadow_trace(need_shadow_k, "jns_k")
            blocked = _or_scatter(blk0, sidx, shit)
        shadow_t_k = _shadow_sign(blocked)
        mark("shadow", shadow_t_k)
    else:
        shadow_t_k = jnp.full(k, -1.0, jnp.float32)

    if idx is None:
        out = combine(color_k, diffuse_k, specular_k, hit, need_shadow_k,
                      shadow_t_k, rd, ambient)
    else:
        rgb_k, alpha_k = finish_light(
            color_k, diffuse_k, specular_k, need_shadow_k, shadow_t_k,
            ambient
        )
        out = combine_scatter(idx, rgb_k, alpha_k, hit, rd)
    mark("combine", out)
    return out


_FUSED_FRAME_CACHE: dict = {}


def _render_frame_opaque(descriptors, octree_scale, mips, mat_params,
                         mat_tex, *, width, height, render_shadows, cam_pos,
                         cam_right, cam_up, cam_fwd, fov_y_rad, aspect,
                         ambient, light_dir, shadow_distance, highlight_pos,
                         max_steps, mark, stack_height=12, engine="esvo",
                         beams=None, prewarm_descriptors=None):
    """Opaque-world frame: first-hit traversal rounds, one finalize on the
    compacted hit lanes, shadow pass returns only the hit flag. Steady-state
    frames run with a single host sync (the hit-count) plus one batched
    plan-refresh readback at frame start.

    Under ``VOXELRS_FUSED_FRAME`` (defaults to the fused-replay setting),
    a frame whose every plan/bucket is already recorded runs as ONE XLA
    program — raygen, coarse/refine traces, merges, finalize, shade,
    certificates, shadow traces and combine fuse end-to-end, eliminating
    all inter-program dispatch gaps. Frames with missing plans (first
    frame, post-overflow re-syncs) fall back to the multi-program path,
    which records them."""
    B = width * height
    store = _opaque_pipeline(B, width, height, max_steps,
                             stack_height, engine)[6]

    store.resolve()  # refresh replay plans from last frame's counts
    mark("plan-refresh", jnp.zeros(1))

    kwargs = dict(
        width=width, height=height, render_shadows=render_shadows,
        max_steps=max_steps, stack_height=stack_height, engine=engine,
    )
    dev_args = (descriptors, octree_scale, mips, mat_params, mat_tex,
                cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect,
                ambient, light_dir, shadow_distance, highlight_pos, beams)

    if _fused_frame_on():
        import os as _os

        # VOXELRS_STAGE_CUT=<stage prefix>: profiling-only knob — truncate
        # the fused program right after the named mark() and return a dummy
        # image anchored on that stage's output (a sum, so XLA can't DCE
        # the work). Each cut's steady frame time is the CUMULATIVE device
        # cost up to that stage inside the one fused program — the only way
        # to attribute time within a single XLA program over the tunnel
        # (scripts/probes/fused_stage_cut.py). Never set in production.
        cut = _os.environ.get("VOXELRS_STAGE_CUT")
        flags = ("opq", width, height, render_shadows, max_steps,
                 stack_height, engine, beams is not None,
                 beams is not None and beams.has_sun(), cut)

        def body_fn(planner, *args):
            planner.reset()
            if not cut:
                img = _opaque_frame_body(
                    *args[:15], beams=args[15], planner=planner,
                    mark=lambda *_a: None, **kwargs)
                return img, tuple(planner.arrays)

            box: list = []

            def cut_mark(name, ref):
                if str(name).startswith(cut):
                    box.append(ref)
                    raise _StageCut()

            try:
                img = _opaque_frame_body(
                    *args[:15], beams=args[15], planner=planner,
                    mark=cut_mark, **kwargs)
            except _StageCut:
                anchor = _anchor_all(box[0])
                img = jnp.zeros((height, width, 4), jnp.float32) + anchor
            return img, tuple(planner.arrays)

        out = _fused_frame_call(store, flags, dev_args, body_fn,
                                prewarm_descriptors=prewarm_descriptors)
        if out is not None:
            mark("fused-frame", out)
            return out

    return _opaque_frame_body(*dev_args[:15], beams=beams, planner=store,
                              mark=mark, **kwargs)


_BATCH_FRAME_CACHE: dict = {}


def render_frames_opaque_batch(descriptors, octree_scale, mips, mat_params,
                               mat_tex, cam_stack, fov_y_rad, aspect,
                               ambient, light_dir, shadow_distance,
                               highlight_pos, *, width, height,
                               render_shadows, max_steps, stack_height,
                               engine, beams_shared=None, t_floor_stack=None):
    """Render N fly-through poses in ONE XLA program via ``lax.map`` over
    the fused opaque frame body.

    Amortizes the per-dispatch fixed floor — measured 46 ms of launch +
    argument landing + fence sync over the tunnel attachment (round-4
    stage cut, docs/PERF.md) — across the N frames of a pose sequence.
    The interactive path stays single-frame (graphics/svo.py ``render``);
    this entry serves the benchmark fly-through, whose poses are a known
    sequence (reference analogue: benchmark-ingame.py renders a fixed
    20 s path).

    ``cam_stack`` = (cam_pos, cam_right, cam_up, cam_fwd) each (N, 3);
    ``t_floor_stack`` (N, B) stacks the per-pose beam floors while the
    rest of the beam context (envelope + sun map) is shared across the
    batch (the certificates are exact wherever their window covers, so
    window placement never changes output). Returns (N, H, W, 4) images,
    or None when a needed plan isn't recorded yet (caller falls back to
    single-frame renders, which record plans)."""
    B = width * height
    store = _opaque_pipeline(B, width, height, max_steps,
                             stack_height, engine)[6]
    store.resolve()

    n_poses = int(cam_stack[0].shape[0])
    kwargs = dict(
        width=width, height=height, render_shadows=render_shadows,
        max_steps=max_steps, stack_height=stack_height, engine=engine,
    )
    flags = ("batch", n_poses, width, height, render_shadows, max_steps,
             stack_height, engine, beams_shared is not None,
             beams_shared is not None and beams_shared.has_sun(),
             t_floor_stack is not None)
    dev_args = (descriptors, octree_scale, mips, mat_params, mat_tex,
                fov_y_rad, aspect, ambient, light_dir, shadow_distance,
                highlight_pos, beams_shared, cam_stack, t_floor_stack)

    def body_fn(planner, descriptors, octree_scale, mips, mat_params,
                mat_tex, fov_y_rad, aspect, ambient, light_dir,
                shadow_distance, highlight_pos, beams_shared, cam_stack,
                t_floor_stack):
        def one(xs):
            planner.reset()
            cp, cr, cu, cf, tf = xs
            beams = None
            if beams_shared is not None:
                from .beams import BeamContext

                beams = BeamContext(
                    tf if tf is not None else beams_shared.t_floor,
                    beams_shared._dev, width, height,
                    sun=beams_shared._sun,
                )
            img = _opaque_frame_body(
                descriptors, octree_scale, mips, mat_params, mat_tex,
                cp, cr, cu, cf, fov_y_rad, aspect, ambient, light_dir,
                shadow_distance, highlight_pos, planner=planner,
                mark=lambda *_a: None, beams=beams, **kwargs)
            return img, tuple(planner.arrays)

        xs = cam_stack + (t_floor_stack,)
        return jax.lax.map(one, xs)

    key = (flags, _plan_snapshot(store))
    entry = _BATCH_FRAME_CACHE.get(key)
    if entry is None:
        planner = _SnapshotPlanner(store)
        entry = (jax.jit(partial(body_fn, planner)), planner)
    jfn, planner = entry
    try:
        imgs, counts = jfn(*dev_args)
    except _IncompleteFramePlan:
        return None
    if key not in _BATCH_FRAME_CACHE:
        if len(_BATCH_FRAME_CACHE) >= 16:
            _BATCH_FRAME_CACHE.pop(next(iter(_BATCH_FRAME_CACHE)))
        _BATCH_FRAME_CACHE[key] = entry
    # refresh plans from the LAST pose's executed counts (plans are
    # hysteretic; one refresh per batch matches the per-frame cadence)
    planner.flush_to_store(
        jax.tree_util.tree_map(lambda a: a[-1], counts))
    return imgs


def _fused_frame_call(store, flags, dev_args, body_fn,
                      prewarm_descriptors=None):
    """Run (and cache) the fused whole-frame program for the current plan
    snapshot; None when a needed plan isn't recorded yet OR while the
    program is still compiling on the background worker (the caller's
    multi-program fallback renders those frames — a plan change then
    costs ~1.1-1.6x one frame instead of a multi-second compile stall).
    The cache key is (static flags, full plan snapshot, arg avals) — any
    plan change retraces (the plan store's structural hysteresis makes
    that rare), and a grown SVO buffer maps to a fresh executable
    instead of an aval-mismatched call on a cached one.

    ``prewarm_descriptors`` (aval pytree of the NEXT buffer-ladder step,
    graphics/svo.py): when the buffer is approaching a ladder boundary,
    submit the executable for the grown shape to the background compiler
    NOW — the growth frame then finds it ready instead of falling back
    to a fully-cold multi-program path (the 19.7 s streaming growth
    stall, docs/streaming_r5.json pre-fix)."""
    key = (flags, _plan_snapshot(store), _arg_avals(dev_args))
    entry = _FUSED_FRAME_CACHE.get(key)
    if entry is None:
        if _async_compile_on():
            planner = _SnapshotPlanner(store)
            jfn = jax.jit(partial(body_fn, planner))
            got = _ASYNC_COMPILED.get_or_submit(
                ("frame", key), jfn, dev_args, payload=planner)
            if got is None:
                return None
            entry = got  # (compiled executable, its traced planner)
        else:
            planner = _SnapshotPlanner(store)
            entry = (jax.jit(partial(body_fn, planner)), planner)
    jfn, planner = entry
    try:
        img, counts = jfn(*dev_args)
    except _IncompleteFramePlan:
        return None
    if key not in _FUSED_FRAME_CACHE:
        if len(_FUSED_FRAME_CACHE) >= 64:
            _FUSED_FRAME_CACHE.pop(next(iter(_FUSED_FRAME_CACHE)))
        _FUSED_FRAME_CACHE[key] = entry
    planner.flush_to_store(counts)
    if prewarm_descriptors is not None and _async_compile_on():
        grown = (prewarm_descriptors,) + tuple(dev_args[1:])
        key2 = (flags, key[1], _arg_avals(grown))
        if key2 != key and key2 not in _FUSED_FRAME_CACHE:
            planner2 = _SnapshotPlanner(store)
            _ASYNC_COMPILED.get_or_submit(
                ("frame", key2), jax.jit(partial(body_fn, planner2)),
                grown, payload=planner2)
    return img


def _opaque_frame_body(descriptors, octree_scale, mips, mat_params,
                       mat_tex, cam_pos, cam_right, cam_up, cam_fwd,
                       fov_y_rad, aspect, ambient, light_dir,
                       shadow_distance, highlight_pos, *, width, height,
                       render_shadows, max_steps, planner, mark,
                       stack_height=12, engine="esvo", beams=None,
                       row0=None, full_height=None):
    """The opaque frame computation. Pure in its array arguments when every
    plan is recorded (``planner`` = a _SnapshotPlanner), which is what lets
    the whole frame trace into one program; with ``planner`` = the plan
    store it runs as the multi-program recording/sync path.

    ``row0``/``full_height`` (multi-chip): render rows
    [row0, row0 + height) of a ``width x full_height`` global frame —
    ``row0`` is a TRACED scalar (the SPMD slab program derives it from the
    mesh axis index) and everything downstream works in slab-local pixel
    space (see parallel/mesh.py)."""
    global _shadow_sign

    B = width * height
    (raygen, _t, shade, _c, _hc, _ho, _gl, combine_scatter,
     finish_light, _store_t, *_adap) = _deferred_pipeline(
        B, width, height, render_shadows, max_steps, 4, stack_height, engine)
    (trace, finalize_lanes, hit_count, hit_order, gather_lanes, pix_rays_jit,
     store, scatter_bool, combine_dense, coarse_rays, adaptive_merge,
     refine_order, merge_refined, shadow_mask1, shadow_cell_merge,
     shadow_combine, adaptive_merge_q, coarse_rays_q, coarse_sub_ids,
     Bc, refine_values, adaptive_merge_e, coarse_rays_e, quarter_sub_ids,
     Bq) = _opaque_pipeline(B, width, height, max_steps,
                            stack_height, engine,
                            full_height=full_height)
    fused = planner is not store
    tr_planner = planner if fused else None
    if _shadow_sign is None:
        _shadow_sign = jax.jit(lambda h: jnp.where(h, 1.0, -1.0))

    cam_args = (cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect)
    # profiling anchor: cut here = the fused program's fixed floor (launch
    # + arg landing + fence sync), everything downstream DCE'd
    _desc0 = jax.tree_util.tree_leaves(descriptors)[0]
    mark("args", cam_pos[0] + _desc0.ravel()[0].astype(jnp.float32))
    if row0 is not None:
        cam_args = cam_args + (jnp.asarray(row0, jnp.int32),)
        ro, rd = pix_rays_jit(jnp.arange(B, dtype=jnp.int32), cam_args)
    else:
        ro, rd = raygen(cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad,
                        aspect)
    mark("raygen", rd)
    t_floor = beams.t_floor if beams is not None else None

    # adaptive ("thick ray") primary pass: quarter-res trace, exact fill of
    # same-leaf interior pixels, full-res re-trace of disagreement pixels
    # (reference README.md:243-254 future-work idea, made exact via leaf
    # identity). Default on for large frames; VOXELRS_ADAPTIVE overrides.
    import os as _os

    _adaptive_env = _os.environ.get("VOXELRS_ADAPTIVE")
    adaptive = (
        bool(int(_adaptive_env)) if _adaptive_env is not None
        else (B >= (1 << 18) and width > 4 and height > 4)
    )

    known = known_value = None
    if adaptive:
        # second level (VOXELRS_HIERARCHY, default on with adaptive):
        # quarter-res trace fills the half-res grid the same way the
        # half-res grid fills pixels. Under round-2's multi-program replay
        # the q-level's extra merge/refine stages cost what it saved
        # (~505 vs ~450 ms steady, docs/ROUND1.md); under round-3's
        # whole-frame fusion those stages fuse away and it measures
        # 18.4 vs 14.9 Mrays/s (docs/ab_r3.json hierarchy_on).
        _hier_env = _os.environ.get("VOXELRS_HIERARCHY")
        # "0" = off, "1" = two-level (quarter feeds half feeds full),
        # "2" = three-level (eighth feeds quarter). Default: two-level.
        try:
            hier_levels = int(_hier_env) if _hier_env else 1
        except ValueError:
            hier_levels = 1
        hierarchy = hier_levels >= 1
        known_c = kval_c = None
        if t_floor is not None and _floor_gather is None:
            _make_floor_gather()

        def _fl(pix_idx):
            return None if t_floor is None else _floor_gather(t_floor,
                                                              pix_idx)

        if hierarchy:
            known_q = kval_q = None
            if hier_levels >= 2 and Bq >= 4096:
                # level 3: trace the eighth-res grid, fill same-surface
                # quarter lanes analytically, re-trace disagreements
                epix, ro_e, rd_e = coarse_rays_e(cam_args)
                frozen_e, hit_e, steps0 = trace(
                    descriptors, octree_scale, ro_e, rd_e,
                    jnp.float32(-1.0), "pixsub", (epix,) + cam_args,
                    "coarse8", t_floor=_fl(epix), planner=tr_planner,
                )
                mark("coarse8", hit_e)
                (frozen_q, hit_q, known_q, kval_q, ref_q_mask,
                 ref_q_count) = adaptive_merge_e(
                    descriptors, frozen_e, hit_e, octree_scale, cam_args)
                k_rq = planner.sticky_scalar("qrefine_k", ref_q_count, Bq)
                idx_rq = refine_order(ref_q_mask, k_rq)
                qpix_sub, ro_rq, rd_rq = quarter_sub_ids(idx_rq, cam_args)
                frozen_rq, hit_rq, steps0b = trace(
                    descriptors, octree_scale, ro_rq, rd_rq,
                    jnp.float32(-1.0), "pixsub", (qpix_sub,) + cam_args,
                    ("qrefine", k_rq), t_floor=_fl(qpix_sub),
                    planner=tr_planner,
                )
                frozen_q, hit_q = merge_refined(frozen_q, hit_q, idx_rq,
                                                frozen_rq, hit_rq)
                steps1 = steps0 + steps0b
                mark("coarse8-refine", hit_q)
            else:
                qpix, ro_q, rd_q = coarse_rays_q(cam_args)
                frozen_q, hit_q, steps1 = trace(
                    descriptors, octree_scale, ro_q, rd_q,
                    jnp.float32(-1.0), "pixsub", (qpix,) + cam_args,
                    "coarse4", t_floor=_fl(qpix), planner=tr_planner,
                )
                mark("coarse4", hit_q)
            (frozen_c, hit_c, known_c, kval_c, ref_c_mask, ref_c_count) = (
                adaptive_merge_q(descriptors, frozen_q, hit_q, octree_scale,
                                 cam_args, known_q, kval_q)
            )
            k_rc = planner.sticky_scalar("crefine_k", ref_c_count, Bc)
            idx_rc = refine_order(ref_c_mask, k_rc)
            cpix_sub, ro_rc, rd_rc = coarse_sub_ids(idx_rc, cam_args)
            frozen_rc, hit_rc, steps1b = trace(
                descriptors, octree_scale, ro_rc, rd_rc, jnp.float32(-1.0),
                "pixsub", (cpix_sub,) + cam_args, ("crefine", k_rc),
                t_floor=_fl(cpix_sub), planner=tr_planner,
            )
            frozen_c, hit_c = merge_refined(frozen_c, hit_c, idx_rc,
                                            frozen_rc, hit_rc)
            steps1 = steps1 + steps1b
            mark("coarse-refine", hit_c)
        else:
            cpidx, ro_c, rd_c = coarse_rays(cam_args)
            frozen_c, hit_c, steps1 = trace(
                descriptors, octree_scale, ro_c, rd_c, jnp.float32(-1.0),
                "pixsub", (cpidx,) + cam_args, "coarse", t_floor=_fl(cpidx),
                planner=tr_planner,
            )
            mark("coarse", hit_c)

        frozen, hit, known, known_value, refine_mask, refine_count = (
            adaptive_merge(descriptors, frozen_c, hit_c, octree_scale,
                           cam_args, known_c, kval_c)
        )
        mark("adaptive-merge", hit)
        k_r = planner.sticky_scalar("refine_k", refine_count, B)
        idx_r = refine_order(refine_mask, k_r)
        ro_r, rd_r = pix_rays_jit(idx_r, cam_args)
        frozen_r, hit_r, steps2 = trace(
            descriptors, octree_scale, ro_r, rd_r, jnp.float32(-1.0),
            "pixsub", (idx_r,) + cam_args, ("refine", k_r),
            t_floor=_fl(idx_r), planner=tr_planner,
        )
        frozen, hit = merge_refined(frozen, hit, idx_r, frozen_r, hit_r)
        steps_total = steps1 + steps2
        mark("refine", hit)

        # fetch the refined lanes' leaf values at the COMPACT width and
        # extend the merge's carried-value plane over them: every hit
        # lane's value is then known and finalize skips its full-width
        # per-lane value fetch (bit-identical — same words either way)
        vals_r = refine_values(descriptors, octree_scale, ro_r, rd_r,
                               frozen_r)
        known = scatter_bool(known, idx_r, hit_r)
        known_value = scatter_bool(known_value, idx_r, vals_r)
        mark("refine-values", known_value)
    else:
        if t_floor is not None and _floor_gather is None:
            _make_floor_gather()
        frozen, hit, steps_total = trace(
            descriptors, octree_scale, ro, rd, jnp.float32(-1.0), "pix",
            cam_args, "primary", t_floor=t_floor, planner=tr_planner,
        )
        mark("primary", hit)

    # the hit-lane bucket replays asynchronously (sticky across frames so
    # the shadow pass's compiled width doesn't wobble). The dense full-width
    # path — the common case — never truncates; in the compacted regime an
    # overflow drops hit pixels until the lagged count lands (~2 frames),
    # at which point resolve() clears the sticky value and the next frame
    # re-syncs exactly — truncation is bounded, not persistent.
    k = planner.sticky_scalar("hits_k", hit_count(hit), B)
    if k >= B // 3:
        # hit-dense frame: compaction's nonzero + 8 wide gathers (slow tier
        # at megapixel row counts) cost more than the sky lanes they remove
        # — shade the full frame in place
        k = B
        idx = None
        hit_k, frozen_k, ro_k, rd_k = hit, frozen, ro, rd
        known_k, known_value_k = known, known_value
    else:
        idx = hit_order(hit, k)
        gathered = gather_lanes(idx, hit, *frozen)
        hit_k = gathered[0]
        frozen_k = gathered[1:]
        ro_k, rd_k = pix_rays_jit(idx, cam_args)
        if known is not None:
            known_k, known_value_k = gather_lanes(idx, known, known_value)
        else:
            known_k = known_value_k = None
    mark("compact-hits", hit_k)

    res = finalize_lanes(descriptors, octree_scale, ro_k, rd_k,
                         jnp.float32(-1.0), frozen_k, hit_k, steps_total,
                         known_k, known_value_k, known_k is not None)
    mark("finalize", res.t)

    def _shade_at(sl):
        return shade(
            (res.t[sl], res.value[sl], res.face_id[sl], res.pos[sl],
             res.uv[sl], res.lod[sl], None),
            ro_k[sl], rd_k[sl], mips, mat_params, mat_tex, cam_pos, ambient,
            light_dir, shadow_distance, highlight_pos,
        )

    if k > 1_600_000:
        # gather cost/lane doubles above ~1.6M gathering lanes (measured,
        # scripts/probes/shade_probe.py) — run the texture-heavy shade in halves
        half = k // 2
        pa = _shade_at(slice(0, half))
        pb = _shade_at(slice(half, k))
        (color_k, diffuse_k, specular_k, _hk, need_shadow_k, shadow_ro_k,
         shadow_rd_k, shadow_max_k) = tuple(
            jnp.concatenate([a, b]) for a, b in zip(pa, pb)
        )
    else:
        (color_k, diffuse_k, specular_k, _hk, need_shadow_k, shadow_ro_k,
         shadow_rd_k, shadow_max_k) = _shade_at(slice(0, k))
    mark("shade", color_k)

    if render_shadows:
        neg_light = -jnp.asarray(light_dir, jnp.float32)
        has_sun = beams is not None and beams.has_sun()
        _sun_ready = _make_sun_ready(store, tr_planner, beams)

        def shadow_trace(mask, name):
            """Resolve shadow verdicts for the masked lanes: gather the
            candidate bucket, certify what the sun map can (bit-identical
            to tracing — a certificate IS the trace's verdict), and trace
            only the uncertified remainder at a second, narrower sticky
            width. Certificates are evaluated on the CANDIDATE BUCKET, not
            the full frame — the full-width sun-verdict gather was the
            single largest device cost of the round-2 frame (~205 ms of
            the 478 ms steady frame, round-3 hardware audit) while the
            verdicts it produced were only ever consumed on these lanes.
            Returns (sidx, blocked) for the kc candidate lanes."""
            cnt = hit_count(mask)
            kc = planner.sticky_scalar(name, cnt, k)
            sidx = hit_order(mask, kc)
            sro2, smax2 = gather_lanes(sidx, shadow_ro_k, shadow_max_k)
            srd2 = jnp.broadcast_to(neg_light, sro2.shape)
            mark(f"shadow-bucket {name}={kc}", sro2)
            sun_now = has_sun and _sun_ready(kc)
            if sun_now:
                lit2, blk2 = beams.sun_verdicts(sro2, smax2)
                mark(f"sun-verdicts {name}", lit2)
                un = _mask_pads(_uncertified(lit2, blk2), cnt)
                kt = planner.sticky_scalar(name + "t", hit_count(un), kc)
                tidx = hit_order(un, kt)
                sro3, smax3 = gather_lanes(tidx, sro2, smax2)
                srd3 = jnp.broadcast_to(neg_light, sro3.shape)
                _f, shit3, _s = trace(
                    descriptors, octree_scale, sro3, srd3, smax3, "dir",
                    (sro3, neg_light), (name, kt), record_frozen=False,
                    planner=tr_planner,
                )
                # pad lanes of tidx duplicate global lane 0 - value-
                # identical writes (certificate == traced verdict). Pads of
                # the CANDIDATE bucket (entries >= cnt) carry certificates
                # of global lane 0's ray, which need not be a candidate —
                # mask them so the OR-scatter back to lane space stays
                # verdict-exact.
                blocked2 = _or_scatter(blk2, tidx, shit3)
                blocked2 = _mask_pads(blocked2, cnt)
                mark(f"shadow-trace {name}", blocked2)
                return sidx, blocked2
            tfl = None
            if beams is not None:
                tfl = beams.shadow_ray_floors(sro2, smax2, neg_light,
                                              prefer_envelope=has_sun)
            _f, shit2, _s = trace(
                descriptors, octree_scale, sro2, srd2, smax2, "dir",
                (sro2, neg_light), (name, kc), record_frozen=False,
                t_floor=tfl, planner=tr_planner,
            )
            mark(f"shadow-trace {name}", shit2)
            return sidx, shit2

        blk0 = jnp.zeros(k, bool)
        if adaptive and idx is None:
            # two-pass cell reuse: trace the coarse-sample pixels' own rays
            # (bit-identical verdicts), reuse them for interior pixels whose
            # 4 cell corners agree, trace only the disagreeing remainder
            sidx1, shit1 = shadow_trace(shadow_mask1(need_shadow_k), "ns1_k")
            blocked = _or_scatter(blk0, sidx1, shit1)
            mask2, reuse, verdict = shadow_cell_merge(need_shadow_k, blocked)
            sidx2, shit2 = shadow_trace(mask2, "ns2_k")
            # OR-scatter: pad lanes duplicate bucket lane 0, whose pad
            # verdict under certificates is the CERTIFICATE-only view (a
            # subset of the traced verdict) — a set-scatter with duplicate
            # indices may let the weaker pad write win (caught by the SPMD
            # slab path, where slab-local lane 0 can be a real candidate)
            blocked = _or_scatter(blocked, sidx2, shit2)
            blocked = shadow_combine(reuse, verdict, blocked)
        else:
            sidx, shit2 = shadow_trace(need_shadow_k, "ns_k")
            blocked = _or_scatter(blk0, sidx, shit2)
        shadow_t_k = _shadow_sign(blocked)
        mark("shadow", shadow_t_k)
    else:
        shadow_t_k = jnp.full(k, -1.0, jnp.float32)

    rgb_k, alpha_k = finish_light(
        color_k, diffuse_k, specular_k, need_shadow_k, shadow_t_k, ambient
    )
    if idx is None:
        out = combine_dense(rgb_k, alpha_k, hit, rd)
    else:
        out = combine_scatter(idx, rgb_k, alpha_k, hit, rd)
    mark("combine", out)
    return out


def crosshair_overlay(image, radius_px: float = 8.0, thickness: float = 1.5):
    """Composite a smooth circular crosshair at the image center
    (reference: assets/shaders/crosshair.glsl:27-36 — smooth circle,
    alpha-blended)."""
    H, W = image.shape[0], image.shape[1]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] - H / 2.0
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] - W / 2.0
    d = jnp.sqrt(yy * yy + xx * xx)
    ring = jnp.clip(1.0 - jnp.abs(d - radius_px) / thickness, 0.0, 1.0)
    alpha = ring[..., None] * 0.8
    rgb = image[..., :3] * (1 - alpha) + alpha
    return jnp.concatenate([rgb, image[..., 3:4]], axis=-1)


def render_frame(descriptors, octree_scale, mips, mat_params, mat_tex, *,
                 width: int, height: int, render_shadows: bool,
                 cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect,
                 ambient, light_dir, shadow_distance, highlight_pos,
                 max_steps: int = 1000, traverse=None):
    """One full frame as a single traced computation. Returns (H, W, 4).

    ``traverse(ro, rd, max_dst, cast_translucent, alpha_fn)`` overrides the
    traversal kernel (the CSVO format path passes its own)."""
    ro, rd = generate_rays(
        width, height, cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect
    )
    alpha_fn = make_alpha_fn(mips, mat_tex)
    if traverse is not None:
        res = traverse(ro, rd, -1.0, True, alpha_fn)
    else:
        res = intersect_octree(
            descriptors, octree_scale, ro, rd, -1.0, True, alpha_fn=alpha_fn,
            max_steps=max_steps,
        )
    img = shade_hits(
        res, ro, rd, mips, mat_params, mat_tex,
        cam_pos=cam_pos, ambient=ambient, light_dir=light_dir,
        render_shadows=render_shadows, shadow_distance=shadow_distance,
        highlight_pos=highlight_pos, descriptors=descriptors,
        octree_scale=octree_scale, alpha_fn=alpha_fn, traverse=traverse,
    )
    return img.reshape(height, width, 4)
