"""VoxelRegistry — declarative texture + material registration.

Builds the device-side material table and texture-array mip stack
(reference: src/graphics/svo_registry.rs:18-166). Textures are either
procedurally generated (deterministic, self-contained) or loaded from PNG
files when a path is registered and Pillow is available.

Device layout:
- ``mips``: tuple of 6 ``(T, h, w, 4)`` float32 arrays (RGBA in [0,1])
- ``mat_params``: ``(num_blocks, 2)`` float32 — specular pow / strength
- ``mat_tex``: ``(num_blocks, 6)`` int32 — top, side, bottom, top_normal,
  side_normal, bottom_normal texture layers; -1 = none
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

TEX_SIZE = 32
MIP_LEVELS = 6
# max unique (color, normal) layer pairs for the paired shading atlas:
# 24 padded 33x33 footprint levels stay under the ~48K-row fast-gather
# tier on the target hardware
PAIR_CAP = 24


def _hash01(ix: np.ndarray, iy: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic integer-hash noise in [0,1)."""
    h = (ix.astype(np.uint32) * np.uint32(374761393)
         + iy.astype(np.uint32) * np.uint32(668265263)
         + np.uint32((salt * 2246822519) & 0xFFFFFFFF))
    h ^= h >> np.uint32(13)
    h = (h * np.uint32(1274126177)) & np.uint32(0xFFFFFFFF)
    h ^= h >> np.uint32(16)
    return (h & np.uint32(0xFFFF)).astype(np.float32) / 65536.0


def procedural_texture(base_rgb, salt: int, variation: float = 0.25,
                       alpha: float | np.ndarray = 1.0,
                       size: int = TEX_SIZE) -> np.ndarray:
    """(size, size, 4) noisy solid-color texture."""
    iy, ix = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    n = _hash01(ix, iy, salt)
    rgb = np.asarray(base_rgb, np.float32)[None, None, :] * (
        1.0 - variation / 2 + variation * n[:, :, None]
    )
    tex = np.empty((size, size, 4), np.float32)
    tex[:, :, :3] = np.clip(rgb, 0.0, 1.0)
    tex[:, :, 3] = alpha
    return tex


def flat_normal_texture(size: int = TEX_SIZE) -> np.ndarray:
    """Identity normal map: (0.5, 0.5, 1, 1) — yields the face normal."""
    tex = np.empty((size, size, 4), np.float32)
    tex[:, :, 0] = 0.5
    tex[:, :, 1] = 0.5
    tex[:, :, 2] = 1.0
    tex[:, :, 3] = 1.0
    return tex


@dataclass
class Material:
    """Rendering properties per block id
    (reference: src/graphics/svo_registry.rs:42-97)."""

    specular_pow: float = 0.0
    specular_strength: float = 0.0
    tex_top: Optional[str] = None
    tex_side: Optional[str] = None
    tex_bottom: Optional[str] = None
    tex_top_normal: Optional[str] = None
    tex_side_normal: Optional[str] = None
    tex_bottom_normal: Optional[str] = None

    def specular(self, pow_: float, strength: float) -> "Material":
        self.specular_pow = pow_
        self.specular_strength = strength
        return self

    def all_sides(self, name: str) -> "Material":
        return self.top(name).side(name).bottom(name)

    def top(self, name: str) -> "Material":
        self.tex_top = name
        return self

    def side(self, name: str) -> "Material":
        self.tex_side = name
        return self

    def bottom(self, name: str) -> "Material":
        self.tex_bottom = name
        return self

    def with_normals(self) -> "Material":
        if self.tex_top:
            self.tex_top_normal = self.tex_top + "_normal"
        if self.tex_side:
            self.tex_side_normal = self.tex_side + "_normal"
        if self.tex_bottom:
            self.tex_bottom_normal = self.tex_bottom + "_normal"
        return self


@dataclass
class VoxelRegistry:
    textures: dict = field(default_factory=dict)  # name -> (H,W,4) f32 array
    materials: dict = field(default_factory=dict)  # block id -> Material

    def add_texture(self, name: str, tex: np.ndarray) -> "VoxelRegistry":
        # all textures in one array share dimensions (GL texture-array rule,
        # reference: texture_array.rs:141); pow2 keeps NEAREST-mag bit-exact
        s = tex.shape[0]
        assert tex.shape == (s, s, 4), tex.shape
        assert s & (s - 1) == 0, f"texture size must be pow2, got {s}"
        if self.textures:
            first = next(iter(self.textures.values()))
            assert first.shape == tex.shape, (
                f"texture {name} is {tex.shape}, array is {first.shape}"
            )
        self.textures[name] = tex.astype(np.float32)
        return self

    def add_texture_file(self, name: str, path: str) -> "VoxelRegistry":
        """Load a PNG at native size (v-flipped like the reference GL
        uploader, texture_array.rs:152-176)."""
        from PIL import Image

        img = Image.open(path).convert("RGBA")
        if self.textures:
            s = next(iter(self.textures.values())).shape[0]
            if img.size != (s, s):
                img = img.resize((s, s), Image.NEAREST)
        arr = np.asarray(img, np.float32) / 255.0
        return self.add_texture(name, arr[::-1].copy())

    def add_material(self, block: int, material: Material) -> "VoxelRegistry":
        self.materials[block] = material
        return self

    def build(self):
        """Build device arrays: (mips, mat_params, mat_tex)."""
        import jax.numpy as jnp

        from ..ops.texture import build_mip_chain

        names = list(self.textures.keys())
        layer_of = {n: i for i, n in enumerate(names)}
        stack = np.stack([self.textures[n] for n in names]) if names else (
            np.zeros((1, TEX_SIZE, TEX_SIZE, 4), np.float32)
        )
        # level count = min(6, ilog2(size)) (reference: texture_array.rs:102)
        levels = min(MIP_LEVELS, int(np.log2(stack.shape[1])))
        mips = build_mip_chain(jnp.asarray(stack), levels)

        max_block = max(self.materials.keys(), default=0)
        mat_params = np.zeros((max_block + 1, 2), np.float32)
        mat_tex = np.full((max_block + 1, 6), -1, np.int32)

        def lookup(name: Optional[str]) -> int:
            if name is None:
                return -1
            return layer_of.get(name, 0)

        for block, m in self.materials.items():
            mat_params[block] = (m.specular_pow, m.specular_strength)
            mat_tex[block] = (
                lookup(m.tex_top),
                lookup(m.tex_side),
                lookup(m.tex_bottom),
                lookup(m.tex_top_normal),
                lookup(m.tex_side_normal),
                lookup(m.tex_bottom_normal),
            )

        # dedup (color, normal) layer pairs into columns 6:9 so shading can
        # sample ONE (<=PAIR_CAP)-layer paired footprint atlas per lane
        # (ops/shading.py surface_shading); registries with more unique
        # pairs keep the 6-column shape and shading falls back to two
        # raw-atlas gathers — still fast-tier, one gather more
        T = stack.shape[0]
        pair_id: dict[tuple[int, int], int] = {}
        pids = np.zeros((mat_tex.shape[0], 3), np.int32)
        for block in range(mat_tex.shape[0]):
            for slot in range(3):
                key = (int(np.clip(mat_tex[block, slot], 0, T - 1)),
                       int(np.clip(mat_tex[block, 3 + slot], 0, T - 1)))
                pids[block, slot] = pair_id.setdefault(key, len(pair_id))
        if len(pair_id) <= PAIR_CAP:
            mat_tex = np.concatenate([mat_tex, pids], axis=1)
        return mips, jnp.asarray(mat_params), jnp.asarray(mat_tex)
