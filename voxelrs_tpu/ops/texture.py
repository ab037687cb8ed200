"""textureLod-equivalent sampling of the texture-array mip stack.

Reproduces the reference's GL sampler state (reference:
src/graphics/texture_array.rs:200-206): CLAMP_TO_EDGE wrap, NEAREST
magnification (lod <= 0), LINEAR_MIPMAP_LINEAR minification (lod > 0).

The mip stack is a tuple of ``(T, h_l, w_l, C)`` arrays, level 0 largest.
Internally the levels flatten into one atlas; ``footprint`` mode further
packs each texel's clamped 2x2 bilinear window into one padded atlas row,
so a bilinear sample is ONE gather (trilinear: two). NEAREST magnification
rides the same gathers by snapping the sample to the texel center (exact
for the pow2 texture sizes used here) — gathers are the dominant cost on
TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from .smalltab import small_lookup


def sample_texture_lod(mips: tuple, layer, uv, lod, mip_mode: str = "linear",
                       footprint: bool = False):
    """textureLod(tex, vec3(uv, layer), lod) for a batch.

    Args:
      mips: tuple of (T, h, w, C) arrays (or (T, h, w) for single-channel).
      layer: (B,) int32 texture layers.
      uv: (B, 2) coordinates.
      lod: (B,) level of detail.
      mip_mode: "linear" = LINEAR_MIPMAP_LINEAR (trilinear); "nearest" =
        LINEAR_MIPMAP_NEAREST (bilinear on the nearest mip — half the
        gather cost, which dominates shading on TPU).
      footprint: gather the whole 2x2 bilinear footprint as ONE row of a
        border-padded neighborhood atlas (each row pre-stores its four
        clamped texels), cutting per-sample gathers 4x (nearest: 4 -> 1,
        linear: 8 -> 2) for bit-identical output. The 4C-wide atlas is
        built in-graph (~50 us of HBM traffic per program call) — use
        from per-frame shading code, NOT inside a traversal loop body
        where XLA would rebuild it per iteration.

    Returns (B, C) (or (B,) for single-channel mips).
    """
    squeeze = mips[0].ndim == 3
    if squeeze:
        mips = tuple(m[..., None] for m in mips)

    n_levels = len(mips)
    T = mips[0].shape[0]
    C = mips[0].shape[-1]
    # The NEAREST-magnification snap ((floor(u*w)+0.5)/w) is only bit-exact
    # when level dims are powers of two (otherwise the recomputed bilinear
    # weight is ~1 ULP off zero and bleeds the neighboring texel).
    for m in mips:
        h, w = m.shape[1], m.shape[2]
        assert h & (h - 1) == 0 and w & (w - 1) == 0, (
            f"sample_texture_lod requires pow2 level dims, got {h}x{w}"
        )
    layer = jnp.clip(layer, 0, T - 1)
    lod = jnp.clip(lod, 0.0, float(n_levels - 1))

    # flatten all levels into one atlas; static per-level metadata.
    # footprint mode pads each level to (h+1, w+1) rows of 4C channels:
    # row (j, i) holds the clamped 2x2 window whose top-left texel index
    # is (j-1, i-1) — exactly the four texels bilinear reads for
    # floor(cy) = j-1, floor(cx) = i-1 (including the uv<0.5/texel edge
    # clamp, where the window index is -1).
    flats = []
    offsets = []
    off = 0
    for m in mips:
        h, w = m.shape[1], m.shape[2]
        if footprint:
            ci0 = jnp.clip(jnp.arange(w + 1) - 1, 0, w - 1)
            ci1 = jnp.clip(jnp.arange(w + 1), 0, w - 1)
            cj0 = jnp.clip(jnp.arange(h + 1) - 1, 0, h - 1)
            cj1 = jnp.clip(jnp.arange(h + 1), 0, h - 1)
            rows = jnp.concatenate(
                [m[:, cj0][:, :, ci0], m[:, cj0][:, :, ci1],
                 m[:, cj1][:, :, ci0], m[:, cj1][:, :, ci1]], axis=-1)
            flats.append(rows.reshape(-1, 4 * C))
            off_step = m.shape[0] * (h + 1) * (w + 1)
        else:
            flats.append(m.reshape(-1, C))
            off_step = m.shape[0] * h * w
        offsets.append(off)
        off += off_step
    atlas = jnp.concatenate(flats, axis=0)
    # per-level metadata rides ONE one-hot lookup (never a per-lane
    # gather — those cost ~4.1 ms/M lanes regardless of table size)
    meta = jnp.stack(
        [
            jnp.array([m.shape[1] for m in mips], jnp.int32),
            jnp.array([m.shape[2] for m in mips], jnp.int32),
            jnp.array(offsets, jnp.int32),
        ],
        axis=1,
    )

    def level_meta(dl):
        row = small_lookup(meta, dl)
        return row[:, 0], row[:, 1], row[:, 2]  # h, w, offset

    if mip_mode == "nearest":
        lod = jnp.round(lod)
    d0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - d0.astype(lod.dtype))[:, None]

    # NEAREST magnification (lod <= 0) rides the same bilinear gathers:
    # snapping the sample point to the texel center makes the bilinear
    # weights degenerate to exactly that texel, saving a dedicated gather
    mag = lod <= 0.0
    h0i, w0i, _ = level_meta(d0)
    w0 = w0i.astype(lod.dtype)
    h0 = h0i.astype(lod.dtype)
    ux = jnp.where(mag, (jnp.floor(uv[:, 0] * w0) + 0.5) / w0, uv[:, 0])
    uy = jnp.where(mag, (jnp.floor(uv[:, 1] * h0) + 0.5) / h0, uv[:, 1])
    uv = jnp.stack([jnp.clip(ux, 0.0, 1.0), jnp.clip(uy, 0.0, 1.0)], axis=-1)

    def bilinear_at(dl):
        dl = jnp.clip(dl, 0, n_levels - 1)
        h, w, off = level_meta(dl)
        cx = uv[:, 0] * w.astype(lod.dtype) - 0.5
        cy = uv[:, 1] * h.astype(lod.dtype) - 0.5
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = (cx - x0)[:, None]
        fy = (cy - y0)[:, None]
        if footprint:
            base = off + layer * (h + 1) * (w + 1)
            xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
            yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
            quad = atlas[base + yi * (w + 1) + xi]
            c00 = quad[:, 0 * C : 1 * C]
            c10 = quad[:, 1 * C : 2 * C]
            c01 = quad[:, 2 * C : 3 * C]
            c11 = quad[:, 3 * C : 4 * C]
        else:
            base = off + layer * h * w
            x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
            x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
            y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
            y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
            c00 = atlas[base + y0i * w + x0i]
            c10 = atlas[base + y0i * w + x1i]
            c01 = atlas[base + y1i * w + x0i]
            c11 = atlas[base + y1i * w + x1i]
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        return top * (1 - fy) + bot * fy

    if mip_mode == "nearest":
        out = bilinear_at(d0)  # frac is 0 after rounding: one quad gather
    else:
        out = bilinear_at(d0) * (1 - frac) + bilinear_at(d0 + 1) * frac
    return out[..., 0] if squeeze else out


def build_mip_chain(base: jnp.ndarray, levels: int) -> tuple:
    """2x2 box-filter mip chain from (T, H, W, C) level 0 (the GL
    glGenerateMipmap default). Stops at 1x1 and repeats it if ``levels``
    exceeds the chain length."""
    mips = [base]
    cur = base
    for _ in range(levels - 1):
        T, h, w, C = cur.shape
        if h > 1 and w > 1:
            cur = cur.reshape(T, h // 2, 2, w // 2, 2, C).mean(axis=(2, 4))
        mips.append(cur)
    return tuple(mips)
