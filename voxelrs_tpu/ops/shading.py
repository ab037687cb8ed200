"""The frame megakernel: ray generation, shading, shadows, sky.

Functional port of the reference's full-frame compute shader
(reference: assets/shaders/world.glsl:27-141) fused with the traversal
kernel: per-pixel primary ray → SVO traversal → texture/normal lookup →
Lambert diffuse + specular → shadow ray → composite, one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp

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


def face_texture_layer(mat_tex, value, face_id, normal: bool):
    """Texture layer for the hit face: side unless top (face 3) / bottom
    (face 2); +3 column offset for normal maps."""
    value = jnp.clip(value.astype(jnp.int32), 0, mat_tex.shape[0] - 1)
    base = 3 if normal else 0
    side = mat_tex[value, base + 1]
    top = mat_tex[value, base + 0]
    bottom = mat_tex[value, base + 2]
    return jnp.where(face_id == 3, top, jnp.where(face_id == 2, bottom, side))


def make_alpha_fn(mips, mat_tex, exact: bool = False):
    """In-traversal texel alpha sampler for translucent pass-through.

    The default fast path reads level 0 with NEAREST — identical to GL
    semantics for lod <= 0 (all hits closer than 15 blocks, where the
    custom lod curve is zero) and only differing on far translucent edges;
    it keeps the traversal loop body small. ``exact=True`` uses the full
    trilinear sampler."""
    if exact:
        def alpha_fn(value, face_id, uv, lod):
            layer = face_texture_layer(mat_tex, value, face_id, normal=False)
            return sample_texture_lod(mips, layer, uv, lod)[:, 3]

        return alpha_fn

    level0 = mips[0]
    T, h, w = level0.shape[0], level0.shape[1], level0.shape[2]
    alpha0 = level0[..., 3]

    def alpha_fn(value, face_id, uv, lod):
        layer = jnp.clip(face_texture_layer(mat_tex, value, face_id, False), 0, T - 1)
        x = jnp.clip(jnp.floor(uv[:, 0] * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip(jnp.floor(uv[:, 1] * h).astype(jnp.int32), 0, h - 1)
        return alpha0[layer, y, x]

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


def shade_hits(res, ro, rd, mips, mat_params, mat_tex, *, cam_pos, ambient,
               light_dir, render_shadows, shadow_distance, highlight_pos,
               descriptors, octree_scale, alpha_fn):
    """Shading of traversal results (reference: world.glsl:27-90)."""
    hit = res.t != -1.0
    B = res.t.shape[0]

    value = jnp.clip(res.value.astype(jnp.int32), 0, mat_params.shape[0] - 1)
    layer = face_texture_layer(mat_tex, res.value, res.face_id, normal=False)
    color = sample_texture_lod(mips, layer, res.uv, res.lod)

    # block highlight outline
    same_block = jnp.all(
        jnp.floor(res.pos) == jnp.floor(highlight_pos)[None, :], axis=-1
    )
    local = jnp.abs(res.uv - 0.5) * 2.0
    lmax = jnp.maximum(local[:, 0], local[:, 1])
    outline = same_block & (lmax > 1.0 - 1.0 / 16.0)
    color = jnp.where(outline[:, None], jnp.ones((1, 4), jnp.float32), color)

    # normal mapping (.xzy swizzle: blue = up -> y axis)
    normal = FACE_NORMALS[res.face_id]
    tangent = FACE_TANGENTS[res.face_id]
    bitangent = FACE_BITANGENTS[res.face_id]
    nlayer = face_texture_layer(mat_tex, res.value, res.face_id, normal=True)
    ntex = sample_texture_lod(mips, jnp.maximum(nlayer, 0), res.uv, res.lod)
    swz = jnp.stack([ntex[:, 0], ntex[:, 2], ntex[:, 1]], axis=-1) * 2.0 - 1.0
    swz = swz / jnp.linalg.norm(swz, axis=-1, keepdims=True)
    mapped = (
        swz[:, 0:1] * tangent + swz[:, 1:2] * normal + swz[:, 2:3] * bitangent
    )
    normal = jnp.where((nlayer != -1)[:, None], mapped, normal)

    diffuse = jnp.maximum(jnp.sum(normal * -light_dir[None, :], axis=-1), 0.0)

    view_dir = res.pos - cam_pos[None, :]
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-12
    )
    incident = -light_dir[None, :]
    reflect_dir = incident - 2.0 * jnp.sum(normal * incident, -1, keepdims=True) * normal
    spec_dot = jnp.maximum(jnp.sum(view_dir * reflect_dir, axis=-1), 0.0)
    spec_pow = jnp.maximum(mat_params[value, 0], 1e-6)
    specular = jnp.power(spec_dot, spec_pow) * mat_params[value, 1]

    if render_shadows:
        need = hit & (res.t < shadow_distance)
        sro = res.pos + normal * 0.001
        srd = jnp.broadcast_to(-light_dir, (B, 3))
        smax = jnp.where(need, -1.0, 1e-35)  # retire unneeded lanes instantly
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
                 max_steps: int = 1000):
    """One full frame as a single traced computation. Returns (H, W, 4)."""
    ro, rd = generate_rays(
        width, height, cam_pos, cam_right, cam_up, cam_fwd, fov_y_rad, aspect
    )
    alpha_fn = make_alpha_fn(mips, mat_tex)
    res = intersect_octree(
        descriptors, octree_scale, ro, rd, -1.0, True, alpha_fn=alpha_fn,
        max_steps=max_steps,
    )
    img = shade_hits(
        res, ro, rd, mips, mat_params, mat_tex,
        cam_pos=cam_pos, ambient=ambient, light_dir=light_dir,
        render_shadows=render_shadows, shadow_distance=shadow_distance,
        highlight_pos=highlight_pos, descriptors=descriptors,
        octree_scale=octree_scale, alpha_fn=alpha_fn,
    )
    return img.reshape(height, width, 4)
