"""Minecraft Anvil import tests against the reference's bundled benchmark
world (skipped when the world isn't present)."""

import os

import numpy as np
import pytest

from voxelrs_tpu.utils.mcanvil import AnvilWorld, decode_packed_indices

WORLD = "/root/reference/assets/worlds/benchmark"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(WORLD), reason="reference benchmark world not present"
)


@pytest.fixture(scope="module")
def world():
    return AnvilWorld(WORLD)


def test_decode_packed_non_spanning():
    # 5-bit indices, 12 per long (1.16+): values 0..11 in one long each slot
    vals = list(range(12))
    packed = 0
    for i, v in enumerate(vals):
        packed |= v << (5 * i)
    longs = np.array([packed, 0], dtype=np.int64)
    out = decode_packed_indices(longs, 5, count=16)
    assert list(out[:12]) == vals


def test_decode_packed_spanning():
    # 5-bit indices crossing long boundaries (pre-1.16): 16 indices in 2 longs
    vals = [(i * 7) % 32 for i in range(25)]
    bits = 0
    for i, v in enumerate(vals):
        bits |= v << (5 * i)
    longs = np.array(
        [(bits >> (64 * k)) & ((1 << 64) - 1) for k in range(2)], dtype=np.uint64
    ).astype(np.int64)
    out = decode_packed_indices(longs, 5, count=25)
    assert list(out) == vals


def test_world_indexes_columns(world):
    assert len(world._raw) > 1000


def test_chunk_voxels_in_terrain_area(world):
    # the bundled world's fully generated strip: MC chunks x~[-73,-12],
    # z~[96,130] -> engine chunks x~[-36,-6], z~[48,65]
    found = None
    for cx in range(-30, -20):
        for cz in range(60, 66):
            for cy in range(0, 3):
                v = world.read_chunk_voxels(cx, cy, cz)
                if v is not None and (v != 0).sum() > 1000:
                    found = (cx, cy, cz, v)
                    break
            if found:
                break
        if found:
            break
    assert found is not None, "no terrain found in the expected strip"
    cx, cy, cz, v = found
    ids = np.unique(v)
    # mapped block ids stay within the engine's registry
    assert ids.max() <= 12
    assert (v != 0).any()


def test_empty_chunk_is_none(world):
    assert world.read_chunk_voxels(10000, 0, 10000) is None
