"""Procedural terrain generation: seeded Perlin noise with octaves and
spline-point remapping, vectorized over whole chunk columns.

Functional mirror of reference: src/gamelogic/worldgen.rs:14-317 — two noise
layers (*continentalness* + *erosion*) remapped through spline points form a
heightmap; chunks fill as grass / 3×dirt / stone below the surface. The
reference's per-column cache + inflight dedup exists to amortize scalar noise
calls across worker threads; here whole ``(32, 32)`` columns vectorize in one
shot, so only a small dict cache remains.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..world.chunk import Chunk, ChunkPos
from . import content


# -- Perlin noise (classic Ken Perlin improved noise, 2D, seeded) -------------

class Perlin:
    def __init__(self, seed: int):
        rng = np.random.default_rng(seed)
        p = rng.permutation(256).astype(np.int32)
        self.perm = np.concatenate([p, p])

    def get(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized 2D Perlin noise in [-1, 1]."""
        xi = np.floor(x).astype(np.int64)
        yi = np.floor(y).astype(np.int64)
        xf = x - xi
        yf = y - yi
        xi &= 255
        yi &= 255

        def fade(t):
            return t * t * t * (t * (t * 6 - 15) + 10)

        def grad(h, gx, gy):
            # 8 gradient directions from hash bits
            h = h & 7
            u = np.where(h < 4, gx, gy)
            v = np.where(h < 4, gy, gx)
            return np.where(h & 1, -u, u) + np.where(h & 2, -2.0 * v, 2.0 * v) * 0.5

        perm = self.perm
        aa = perm[perm[xi] + yi]
        ab = perm[perm[xi] + yi + 1]
        ba = perm[perm[xi + 1] + yi]
        bb = perm[perm[xi + 1] + yi + 1]

        u = fade(xf)
        v = fade(yf)
        x1 = grad(aa, xf, yf) * (1 - u) + grad(ba, xf - 1, yf) * u
        x2 = grad(ab, xf, yf - 1) * (1 - u) + grad(bb, xf - 1, yf - 1) * u
        return (x1 * (1 - v) + x2 * v) * 0.7071


@dataclass
class SplinePoint:
    x: float
    y: float


@dataclass
class Noise:
    """Octaved noise with spline remap (reference: worldgen.rs:14-78)."""

    frequency: float
    octaves: int
    spline_points: list[SplinePoint] = field(default_factory=list)

    def get(self, perlin: Perlin, x: np.ndarray, z: np.ndarray) -> np.ndarray:
        v = self.get_noise_value(perlin, x, z)
        return self.interpolate_spline_points(self.spline_points, v)

    def get_noise_value(self, perlin: Perlin, x, z) -> np.ndarray:
        f = float(self.frequency)
        a = 1.0
        v = np.zeros_like(np.asarray(x, np.float64))
        for _ in range(self.octaves):
            v = v + perlin.get(x * f + 0.5, z * f + 0.5) * a
            f *= 2.0
            a *= 0.5
        return v

    @staticmethod
    def interpolate_spline_points(points: list[SplinePoint], x) -> np.ndarray:
        """Piecewise-linear remap; values outside the range clamp to the end
        points (reference: worldgen.rs:56-77)."""
        x = np.asarray(x, np.float64)
        if not points:
            return np.zeros_like(x)
        xs = np.array([p.x for p in points], np.float64)
        ys = np.array([p.y for p in points], np.float64)
        # np.interp matches the reference's clamping linear interpolation
        return np.interp(x, xs, ys)


@dataclass
class Config:
    sea_level: int
    continentalness: Noise
    erosion: Noise


def default_config() -> Config:
    """The game's worldgen parameters
    (reference: src/gamelogic/world.rs:56-78)."""
    return Config(
        sea_level=70,
        continentalness=Noise(
            frequency=0.001,
            octaves=3,
            spline_points=[
                SplinePoint(-1.0, 20.0),
                SplinePoint(0.4, 50.0),
                SplinePoint(0.6, 70.0),
                SplinePoint(0.8, 120.0),
                SplinePoint(0.9, 190.0),
                SplinePoint(1.0, 200.0),
            ],
        ),
        erosion=Noise(
            frequency=0.01,
            octaves=4,
            spline_points=[SplinePoint(-1.0, -10.0), SplinePoint(1.0, 4.0)],
        ),
    )


@dataclass
class ChunkColumn:
    min_y: int
    max_y: int
    height_map: np.ndarray  # (32, 32) int32, indexed [x, z]

    def contains_chunk(self, chunk_y: int) -> bool:
        return self.min_y <= (chunk_y + 1) * 32 and self.max_y >= chunk_y * 32


class Generator:
    """Noise world generator with a per-(x,z)-column heightmap cache."""

    MAX_CACHED_COLUMNS = 500

    def __init__(self, seed: int, cfg: Config):
        self.cfg = cfg
        self.perlin = Perlin(seed)
        self._columns: dict[tuple[int, int], ChunkColumn] = {}
        self._lock = __import__("threading").Lock()

    def get_column(self, col_x: int, col_z: int) -> ChunkColumn:
        key = (col_x, col_z)
        with self._lock:
            col = self._columns.get(key)
        if col is not None:
            return col
        col = self._generate_column(col_x, col_z)
        with self._lock:
            self._columns[key] = col
            while len(self._columns) > self.MAX_CACHED_COLUMNS:
                self._columns.pop(next(iter(self._columns)))
        return col

    def _generate_column(self, col_x: int, col_z: int) -> ChunkColumn:
        x = np.arange(32, dtype=np.float64) + col_x * 32
        z = np.arange(32, dtype=np.float64) + col_z * 32
        gx, gz = np.meshgrid(x, z, indexing="ij")
        height = self.cfg.continentalness.get(self.perlin, gx, gz)
        height = height + self.cfg.erosion.get(self.perlin, gx, gz)
        hm = height.astype(np.int32)
        return ChunkColumn(int(hm.min()), int(hm.max()), hm)

    # -- ChunkGenerator interface (reference: systems/worldgen.rs:7-14) ------

    def is_interested_in(self, pos: ChunkPos) -> bool:
        return self.get_column(pos.x, pos.z).contains_chunk(pos.y)

    def generate_chunk(self, chunk: Chunk) -> None:
        """Vectorized fill: grass at the surface, 3 dirt below, then stone
        (reference: worldgen.rs:294-316)."""
        col = self.get_column(chunk.pos.x, chunk.pos.z)
        h = col.height_map.astype(np.int32) - chunk.pos.y * 32  # (x, z)
        y = np.arange(32, dtype=np.int32)[None, :, None]
        hh = h[:, None, :]
        block = np.where(
            y > hh,
            content.AIR,
            np.where(y >= hh, content.GRASS, np.where(y >= hh - 3, content.DIRT, content.STONE)),
        ).astype(np.uint32)
        chunk.voxels[:] = block
