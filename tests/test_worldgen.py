"""Worldgen noise/spline tests (model: reference worldgen.rs:80-132)."""

import numpy as np

from voxelrs_tpu.gamelogic.worldgen import (
    Config,
    Generator,
    Noise,
    Perlin,
    SplinePoint,
    default_config,
)
from voxelrs_tpu.world.chunk import Chunk, ChunkPos


def test_interpolate_spline_points():
    f = Noise.interpolate_spline_points
    assert f([], 0.0) == 0.0
    pts = [SplinePoint(0.5, 1.0)]
    assert f(pts, 0.25) == 1.0
    assert f(pts, 0.75) == 1.0
    pts = [SplinePoint(0.0, 1.0), SplinePoint(0.5, 2.0), SplinePoint(1.0, 3.0)]
    for x, y in [(-0.5, 1.0), (0.0, 1.0), (0.25, 1.5), (0.5, 2.0), (0.75, 2.5),
                 (1.0, 3.0), (1.5, 3.0)]:
        assert float(f(pts, x)) == y


def test_perlin_properties():
    p = Perlin(1)
    xs = np.linspace(-100, 100, 4096)
    v = p.get(xs, xs * 0.7)
    assert np.abs(v).max() <= 1.0
    assert v.std() > 0.05  # not degenerate
    # integer lattice points are zeros for classic Perlin
    zi = p.get(np.arange(16, dtype=np.float64), np.arange(16, dtype=np.float64))
    np.testing.assert_allclose(zi, 0.0, atol=1e-12)
    # deterministic per seed; different seeds differ
    v2 = Perlin(1).get(xs, xs * 0.7)
    np.testing.assert_array_equal(v, v2)
    v3 = Perlin(2).get(xs, xs * 0.7)
    assert np.abs(v - v3).max() > 0.01


def test_octaves_accumulate():
    p = Perlin(0)
    one = Noise(frequency=0.01, octaves=1, spline_points=[])
    three = Noise(frequency=0.01, octaves=3, spline_points=[])
    xs = np.linspace(0, 1000, 512)
    v1 = one.get_noise_value(p, xs, xs)
    v3 = three.get_noise_value(p, xs, xs)
    assert not np.allclose(v1, v3)
    # octave amplitudes sum geometrically -> bounded by 2x single octave range
    assert np.abs(v3).max() <= 2.0


def test_generator_terrain_shape():
    gen = Generator(1, default_config())
    col = gen.get_column(0, 0)
    assert col.height_map.shape == (32, 32)
    assert col.min_y <= col.max_y
    # heights fall within the spline output range (plus erosion)
    assert col.min_y >= 20 - 10 - 2 and col.max_y <= 200 + 4 + 2

    pos = ChunkPos(0, col.min_y >> 5, 0)
    assert gen.is_interested_in(pos)
    assert not gen.is_interested_in(ChunkPos(0, 100, 0))

    chunk = Chunk(ChunkPos(0, (col.min_y >> 5), 0))
    gen.generate_chunk(chunk)
    vox = chunk.voxels
    assert vox.any()
    # column law: grass at surface, dirt 3 below, stone under that
    for x, z in [(0, 0), (13, 7), (31, 31)]:
        h = int(col.height_map[x, z]) - chunk.pos.y * 32
        if 0 <= h < 32:
            assert vox[x, h, z] == 1  # GRASS
            if h + 1 < 32:
                assert vox[x, h + 1, z] == 0
            for d in (1, 2, 3):
                if h - d >= 0:
                    assert vox[x, h - d, z] == 2  # DIRT
            if h - 4 >= 0:
                assert vox[x, h - 4, z] == 3  # STONE


def test_generator_is_seed_stable():
    a = Generator(7, default_config()).get_column(3, -2).height_map
    b = Generator(7, default_config()).get_column(3, -2).height_map
    np.testing.assert_array_equal(a, b)


def test_columns_are_continuous_across_chunks():
    gen = Generator(1, default_config())
    a = gen.get_column(0, 0).height_map
    b = gen.get_column(1, 0).height_map
    # adjacent columns' edge heights differ by a small amount (continuity)
    assert np.abs(a[31, :] - b[0, :]).max() <= 6


def test_noise_crate_reference_vectors():
    """Exact values from the reference's own unit test
    (worldgen.rs:88-103, noise_tests::get, seed 0)."""
    n = Noise(frequency=2.0, octaves=3,
              spline_points=[SplinePoint(-1.0, 0.0), SplinePoint(1.0, 1.0)])
    p = Perlin(0)
    expected = {(0, 0): 0.5, (1, 0): 0.234834, (0, 1): 0.676776, (1, 1): 0.411611}
    for (x, z), exp in expected.items():
        got = float(n.get(p, np.float64(x), np.float64(z)))
        assert abs(got - exp) < 2e-6, f"({x},{z}): {got} != {exp}"


def test_seed1_terrain_matches_reference_world():
    """Seed-1 heightmap invariants confirmed against the reference's
    end-to-end expected image (world.rs:461-498): gentle ~37-high terrain at
    the test camera (-24, 80, 174) with the big mountain rising past z=0."""
    gen = Generator(1, default_config())
    cfg = gen.cfg

    def h(x, z):
        v = (cfg.continentalness.get(gen.perlin, np.float64(x), np.float64(z))
             + cfg.erosion.get(gen.perlin, np.float64(x), np.float64(z)))
        return int(v)  # Rust `as i32` truncation

    assert h(-24, 174) == 37   # camera column: y=80 is in the air
    assert h(-24, 0) == 65
    assert h(-24, -75) == 197  # the mountain in view
    assert h(-24, -250) == 195
