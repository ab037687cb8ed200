"""Block ids and the default material/texture registry
(reference: src/gamelogic/content.rs:6-62).

Textures are procedurally generated stand-ins with the reference's material
topology (per-face textures, normal maps, translucent glass/water/leaves).
``new_registry(texture_dir=...)`` loads PNGs instead when a directory with
the reference naming convention is supplied.
"""

from __future__ import annotations

import os

import numpy as np

from ..graphics.registry import (
    Material,
    VoxelRegistry,
    flat_normal_texture,
    procedural_texture,
)

AIR = 0
GRASS = 1
DIRT = 2
STONE = 3
STONE_BRICKS = 4
GLASS = 5
GRAVEL = 6
SAND = 7
WATER = 8
OAK_LOG = 9
OAK_LEAVES = 10
OAK_PLANKS = 11
COBBLESTONE = 12

# name -> (base rgb, salt, variation)
_PROC_COLORS = {
    "dirt": ((0.52, 0.37, 0.26), 1, 0.30),
    "grass_side": ((0.45, 0.42, 0.24), 2, 0.30),
    "grass_top": ((0.36, 0.62, 0.28), 3, 0.25),
    "stone": ((0.55, 0.55, 0.55), 4, 0.20),
    "stone_bricks": ((0.52, 0.50, 0.50), 5, 0.15),
    "gravel": ((0.50, 0.47, 0.45), 6, 0.40),
    "sand": ((0.86, 0.80, 0.58), 7, 0.15),
    "oak_log": ((0.42, 0.33, 0.20), 8, 0.25),
    "oak_log_top": ((0.60, 0.48, 0.30), 9, 0.20),
    "oak_planks": ((0.64, 0.51, 0.31), 10, 0.15),
    "cobblestone": ((0.45, 0.45, 0.45), 11, 0.35),
}

_TEXTURE_FILES = [
    "dirt", "dirt_normal", "grass_side", "grass_side_normal", "grass_top",
    "grass_top_normal", "stone", "stone_normal", "stone_bricks",
    "stone_bricks_normal", "glass", "gravel", "gravel_normal", "sand",
    "sand_normal", "water", "oak_log", "oak_log_normal", "oak_log_top",
    "oak_log_top_normal", "oak_leaves", "oak_planks", "oak_planks_normal",
    "cobblestone", "cobblestone_normal",
]


def _glass_texture() -> np.ndarray:
    """Transparent pane with an opaque 2px frame."""
    tex = procedural_texture((0.85, 0.93, 0.95), 20, 0.05, alpha=0.0)
    tex[:2, :, 3] = 1.0
    tex[-2:, :, 3] = 1.0
    tex[:, :2, 3] = 1.0
    tex[:, -2:, 3] = 1.0
    return tex


def _water_texture() -> np.ndarray:
    return procedural_texture((0.18, 0.35, 0.75), 21, 0.15, alpha=0.65)


def _leaves_texture() -> np.ndarray:
    tex = procedural_texture((0.22, 0.45, 0.18), 22, 0.35)
    from ..graphics.registry import _hash01

    iy, ix = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    holes = _hash01(ix, iy, 23) < 0.25
    tex[:, :, 3] = np.where(holes, 0.0, 1.0)
    return tex


def new_registry(texture_dir: str | None = None) -> VoxelRegistry:
    reg = VoxelRegistry()

    if texture_dir and os.path.isdir(texture_dir):
        for name in _TEXTURE_FILES:
            path = os.path.join(texture_dir, f"{name.replace('_normal', '_n')}.png")
            if os.path.exists(path):
                reg.add_texture_file(name, path)
    if not reg.textures:
        for name, (rgb, salt, var) in _PROC_COLORS.items():
            reg.add_texture(name, procedural_texture(rgb, salt, var))
        reg.add_texture("glass", _glass_texture())
        reg.add_texture("water", _water_texture())
        reg.add_texture("oak_leaves", _leaves_texture())
        normal = flat_normal_texture()
        for name in list(_PROC_COLORS.keys()):
            reg.add_texture(name + "_normal", normal)

    (
        reg.add_material(AIR, Material())
        .add_material(GRASS, Material().specular(14, 0.4).top("grass_top").side("grass_side").bottom("dirt").with_normals())
        .add_material(DIRT, Material().specular(14, 0.4).all_sides("dirt").with_normals())
        .add_material(STONE, Material().specular(70, 0.4).all_sides("stone").with_normals())
        .add_material(STONE_BRICKS, Material().specular(70, 0.4).all_sides("stone_bricks").with_normals())
        .add_material(GLASS, Material().specular(70, 0.4).all_sides("glass"))
        .add_material(GRAVEL, Material().specular(70, 0.4).all_sides("gravel").with_normals())
        .add_material(SAND, Material().specular(70, 0.4).all_sides("sand").with_normals())
        .add_material(WATER, Material().specular(70, 0.4).all_sides("water"))
        .add_material(OAK_LOG, Material().specular(70, 0.4).side("oak_log").top("oak_log_top").bottom("oak_log_top").with_normals())
        .add_material(OAK_LEAVES, Material().specular(70, 0.4).all_sides("oak_leaves"))
        .add_material(OAK_PLANKS, Material().specular(70, 0.4).all_sides("oak_planks").with_normals())
        .add_material(COBBLESTONE, Material().specular(70, 0.4).all_sides("cobblestone").with_normals())
    )
    return reg
