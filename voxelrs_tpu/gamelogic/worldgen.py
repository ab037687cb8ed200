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


# -- Perlin noise (reconstruction of the `noise` crate v0.8.2) -----------------
#
# The reference uses noise-rs's Perlin (reference: worldgen.rs:6,182) whose
# output is fully determined by: a 256-entry permutation table produced by a
# XorShiftRng-seeded Fisher-Yates shuffle (rand 0.7 semantics), an xor-fold
# hash, the four diagonal gradients, quintic smoothing, a sqrt(2) scale and
# a [-1,1] clamp. Reconstructed from behavior and validated against the
# reference's own noise_tests::get expectations (worldgen.rs:88-103) and the
# end-to-end expected image — see tests/test_worldgen.py.


class _XorShift:
    """rand_xorshift 0.2 XorShiftRng (x, y, z, w u32 state)."""

    def __init__(self, x: int, y: int, z: int, w: int):
        self.x, self.y, self.z, self.w = x, y, z, w

    def next_u32(self) -> int:
        x = self.x
        t = (x ^ (x << 11)) & 0xFFFFFFFF
        self.x, self.y, self.z = self.y, self.z, self.w
        w = self.w
        self.w = (w ^ (w >> 19) ^ (t ^ (t >> 8))) & 0xFFFFFFFF
        return self.w


def _gen_index(rng: _XorShift, n: int) -> int:
    """rand 0.7 `gen_range(0, n)` for n <= u32::MAX: one u32 draw, widening
    multiply, zone rejection."""
    lz = 32 - n.bit_length()
    zone = ((n << lz) - 1) & 0xFFFFFFFF
    while True:
        v = rng.next_u32()
        prod = v * n
        hi, lo = prod >> 32, prod & 0xFFFFFFFF
        if lo <= zone:
            return hi


def _permutation_table(seed: int) -> np.ndarray:
    """noise-rs PermutationTable::new(seed): XorShiftRng seeded with state
    words [1, seed, seed, seed] and a reverse Fisher-Yates shuffle of 0..255.
    Layout confirmed against the reference's end-to-end expected image
    (seed-1 terrain) and noise_tests::get vectors (seed 0)."""
    s = int(seed) & 0xFFFFFFFF
    rng = _XorShift(1, s, s, s)
    seq = list(range(256))
    for i in range(255, 0, -1):
        j = _gen_index(rng, i + 1)
        seq[i], seq[j] = seq[j], seq[i]
    return np.array(seq, np.int64)


_SQRT2 = np.float64(np.sqrt(2.0))


class Perlin:
    def __init__(self, seed: int):
        self.values = _permutation_table(seed)

    def get(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized noise-rs perlin_2d in [-1, 1]."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        xi = np.floor(x)
        yi = np.floor(y)
        cx = xi.astype(np.int64)
        cy = yi.astype(np.int64)
        dx = x - xi
        dy = y - yi
        V = self.values

        def gdot(ox, oy):
            h = V[V[(cx + ox) & 255] ^ ((cy + oy) & 255)]
            gx = np.where(h & 1, -1.0, 1.0)
            gy = np.where(h & 2, -1.0, 1.0)
            return gx * (dx - ox) + gy * (dy - oy)

        g00, g10, g01, g11 = gdot(0, 0), gdot(1, 0), gdot(0, 1), gdot(1, 1)

        def quintic(t):
            return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

        u = quintic(dx)
        v = quintic(dy)
        a = g00 + u * (g10 - g00)
        b = g01 + u * (g11 - g01)
        return np.clip((a + v * (b - a)) * _SQRT2, -1.0, 1.0)


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
        # frequency is stored f32 and widened per the reference
        # (worldgen.rs:42-54: `self.frequency as f64`)
        f = float(np.float64(np.float32(self.frequency)))
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
        points. The interpolation factor is computed in f32 like the
        reference (worldgen.rs:56-77: `(x as f32 - lhs.x) / (rhs.x - lhs.x)`
        then widened for the mul_add)."""
        x = np.asarray(x, np.float64)
        if not points:
            return np.zeros_like(x)
        xs32 = np.array([p.x for p in points], np.float32)
        ys32 = np.array([p.y for p in points], np.float32)
        # rhs = first point with (x_point as f64) > value; ends clamp
        idx = np.searchsorted(xs32.astype(np.float64), x, side="right")
        lhs = np.clip(idx - 1, 0, len(points) - 1)
        rhs = np.clip(idx, 0, len(points) - 1)
        factor = (x.astype(np.float32) - xs32[lhs]) / np.where(
            rhs > lhs, xs32[rhs] - xs32[lhs], np.float32(1.0)
        )
        v_start = ys32[lhs].astype(np.float64)
        v_diff = (ys32[rhs] - ys32[lhs]).astype(np.float64)
        interp = v_start + v_diff * factor.astype(np.float64)
        # outside the range: the end point's value, uninterpolated
        interp = np.where(idx == 0, ys32[0].astype(np.float64), interp)
        interp = np.where(idx == len(points), ys32[-1].astype(np.float64), interp)
        return interp


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
