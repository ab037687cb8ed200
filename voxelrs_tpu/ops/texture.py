"""textureLod-equivalent sampling of the texture-array mip stack.

Reproduces the reference's GL sampler state (reference:
src/graphics/texture_array.rs:200-206): CLAMP_TO_EDGE wrap, NEAREST
magnification (lod <= 0), LINEAR_MIPMAP_LINEAR minification (lod > 0).

The mip stack is a tuple of ``(T, h_l, w_l, C)`` arrays, level 0 largest.
"""

from __future__ import annotations

import jax.numpy as jnp


def _nearest(level, layer, uv):
    """NEAREST filtering at one level. uv (B,2) in [0,1], layer (B,)."""
    T, h, w = level.shape[0], level.shape[1], level.shape[2]
    x = jnp.clip(jnp.floor(uv[:, 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.floor(uv[:, 1] * h).astype(jnp.int32), 0, h - 1)
    return level[jnp.clip(layer, 0, T - 1), y, x]


def _bilinear(level, layer, uv):
    """LINEAR filtering with CLAMP_TO_EDGE at one level."""
    T, h, w = level.shape[0], level.shape[1], level.shape[2]
    lyr = jnp.clip(layer, 0, T - 1)
    cx = uv[:, 0] * w - 0.5
    cy = uv[:, 1] * h - 0.5
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, None]
    fy = (cy - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    c00 = level[lyr, y0i, x0i]
    c10 = level[lyr, y0i, x1i]
    c01 = level[lyr, y1i, x0i]
    c11 = level[lyr, y1i, x1i]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_texture_lod(mips: tuple, layer, uv, lod):
    """textureLod(tex, vec3(uv, layer), lod) for a batch.

    Args:
      mips: tuple of (T, h, w, C) arrays (or (T, h, w) for single-channel).
      layer: (B,) int32 texture layers.
      uv: (B, 2) coordinates.
      lod: (B,) level of detail.

    Returns (B, C) (or (B,) for single-channel mips).
    """
    squeeze = mips[0].ndim == 3
    if squeeze:
        mips = tuple(m[..., None] for m in mips)

    n_levels = len(mips)
    lod = jnp.clip(lod, 0.0, float(n_levels - 1))

    # minification: trilinear between floor/ceil mips, computed per level and
    # selected (levels have distinct shapes, so no single gather applies)
    d0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - d0.astype(lod.dtype))[:, None]
    per_level = jnp.stack([_bilinear(m, layer, uv) for m in mips])  # (L,B,C)
    lanes = jnp.arange(layer.shape[0])
    c0 = per_level[jnp.clip(d0, 0, n_levels - 1), lanes]
    c1 = per_level[jnp.clip(d0 + 1, 0, n_levels - 1), lanes]
    tri = c0 * (1 - frac) + c1 * frac

    # magnification (lod <= 0): NEAREST on level 0
    near = _nearest(mips[0], layer, uv)
    out = jnp.where((lod <= 0.0)[:, None], near, tri)
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
